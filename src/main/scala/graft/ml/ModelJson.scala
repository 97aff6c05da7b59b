package graft.ml

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON (de)serialization of [[BoosterModel]] — our analogue of the
  * reference holding the xgboost JSON model string and persisting it as a
  * 1-row parquet DataFrame (reference `sparkdl/xgboost/model.py:35-59,
  * 124-128`). Format is our own: trees as structure-of-arrays.
  */
object ModelJson {
  private val Format = "graft-gbt-1"

  def toJson(model: BoosterModel): String = {
    def darr(a: Array[Float]) = JArray(a.map(v => JDouble(v.toDouble)).toList)
    def iarr(a: Array[Int]) = JArray(a.map(v => JInt(BigInt(v))).toList)
    def barr(a: Array[Boolean]) = JArray(a.map(JBool(_)).toList)
    val trees = JArray(model.trees.map { t =>
      JObject(
        "feature" -> iarr(t.feature),
        "threshold" -> darr(t.threshold),
        "default_left" -> barr(t.defaultLeft),
        "left" -> iarr(t.left),
        "right" -> iarr(t.right),
        "weight" -> darr(t.weight),
        "gain" -> darr(t.gain),
        "cover" -> darr(t.cover))
    }.toList)
    val fields = List(
      "format" -> JString(Format),
      "objective" -> JString(model.objectiveName),
      "num_class" -> JInt(BigInt(model.numClass)),
      "num_features" -> JInt(BigInt(model.numFeatures)),
      "base_margin" -> JDouble(model.baseMargin.toDouble),
      "missing" -> (if (model.missing.isNaN) JString("nan") else JDouble(model.missing.toDouble)),
      "trees" -> trees) ++
      model.bestScore.map(s => "best_score" -> JDouble(s)).toList ++
      model.bestIteration.map(i => "best_iteration" -> JInt(BigInt(i))).toList
    JsonMethods.compact(JsonMethods.render(JObject(fields)))
  }

  def fromJson(json: String): BoosterModel = {
    val root = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def str(k: String) = root(k).asInstanceOf[JString].s
    def int(k: String) = root(k).asInstanceOf[JInt].num.toInt
    def dbl(v: JValue): Double = v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }
    require(str("format") == Format, s"unknown model format: ${str("format")}")
    val trees = root("trees").asInstanceOf[JArray].arr.map { tv =>
      val t = tv.asInstanceOf[JObject].obj.toMap
      def ints(k: String) = t(k).asInstanceOf[JArray].arr.map(v => v.asInstanceOf[JInt].num.toInt).toArray
      def floats(k: String) = t(k).asInstanceOf[JArray].arr.map(v => dbl(v).toFloat).toArray
      def bools(k: String) = t(k).asInstanceOf[JArray].arr.map(v => v.asInstanceOf[JBool].value).toArray
      def optFloats(k: String) = // absent in older serialized models → zeros
        if (t.contains(k)) floats(k)
        else new Array[Float](t("feature").asInstanceOf[JArray].arr.length)
      new Tree(ints("feature"), floats("threshold"), bools("default_left"),
        ints("left"), ints("right"), floats("weight"), optFloats("gain"),
        optFloats("cover"))
    }.toArray
    val missing = root("missing") match {
      case JString(_) => Float.NaN
      case v => dbl(v).toFloat
    }
    new BoosterModel(
      str("objective"), int("num_class"), int("num_features"),
      dbl(root("base_margin")).toFloat, trees, missing,
      root.get("best_score").map(dbl),
      root.get("best_iteration").map(v => v.asInstanceOf[JInt].num.toInt))
  }
}
