package graft.ml

import org.apache.spark.ml.param.{Param, Params}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Spark-ML-compatible metadata persistence, written in the same JSON shape
  * as Spark's DefaultParamsWriter (class/timestamp/sparkVersion/uid/paramMap)
  * so `Pipeline.load` can dispatch to our readers by class name. The trained
  * model itself is a 1-row parquet DataFrame of the model JSON string —
  * the exact persistence shape of the reference
  * (reference `sparkdl/xgboost/model.py:95-233`, SURVEY §3.4 / F8).
  */
object GraftMLIO {

  def saveMetadata(instance: Params, className: String, path: String,
      spark: SparkSession): Unit = {
    // Param.jsonEncode handles the NaN default of `missing` as "NaN"
    val paramMap = JObject(instance.extractParamMap().toSeq
      .map(p => p.param.name -> JsonMethods.parse(
        p.param.asInstanceOf[Param[Any]].jsonEncode(p.value))).toList)
    val meta = JObject(List(
      "class" -> JString(className),
      "timestamp" -> JInt(BigInt(System.currentTimeMillis())),
      "sparkVersion" -> JString(spark.version),
      "uid" -> JString(instance.uid),
      "paramMap" -> paramMap,
      "defaultParamMap" -> JObject(Nil)))
    spark.createDataFrame(Seq(Tuple1(JsonMethods.compact(JsonMethods.render(meta)))))
      .toDF("value").coalesce(1).write.text(s"$path/metadata")
  }

  /** Returns (uid, className); applies persisted params onto the instance. */
  def loadMetadata(instance: Params, expectedClass: String, path: String,
      spark: SparkSession): String = {
    val json = spark.read.text(s"$path/metadata").collect()(0).getString(0)
    val root = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    val className = root("class").asInstanceOf[JString].s
    require(className == expectedClass,
      s"Expected class name $expectedClass but found class name $className")
    root("paramMap").asInstanceOf[JObject].obj.foreach { case (name, jv) =>
      instance.params.find(_.name == name).foreach { p =>
        instance.set(p.asInstanceOf[Param[Any]],
          p.jsonDecode(JsonMethods.compact(JsonMethods.render(jv))))
      }
    }
    root("uid").asInstanceOf[JString].s
  }

  def saveModelJson(json: String, path: String, spark: SparkSession): Unit =
    spark.createDataFrame(Seq(Tuple1(json))).toDF("model_json")
      .coalesce(1).write.parquet(s"$path/model")

  def loadModelJson(path: String, spark: SparkSession): String =
    spark.read.parquet(s"$path/model").collect()(0).getString(0)
}
