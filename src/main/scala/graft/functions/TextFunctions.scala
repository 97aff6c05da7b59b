package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-pipeline scalar functions.
  *
  * The hot-path primitive (document fingerprinting) is a native Catalyst
  * `Expression` WITH `doGenCode`, so it stays inside whole-stage codegen —
  * preference order (b) from the build brief: composing built-ins was not
  * possible (Spark has no rolling polynomial hash), and a Scala UDF would
  * break codegen and add serialization per row.
  */
object TextFunctions {

  /** 64-bit FNV-1a over UTF-8 bytes — deterministic rolling document
    * fingerprint; same constants as the public FNV spec. */
  case class Fnv64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bytes = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        s"""
          byte[] $bytes = $c.getBytes();
          long $h = 0xcbf29ce484222325L;
          for (int $i = 0; $i < $bytes.length; $i++) {
            $h ^= ($bytes[$i] & 0xffL);
            $h *= 0x100000001b3L;
          }
          ${ev.value} = $h;
        """
      })
    override protected def withNewChildInternal(newChild: Expression): Fnv64 = copy(newChild)
  }

  def fnv64(c: Column): Column =
    ColumnBridge.column(Fnv64(ColumnBridge.expression(c)))

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish subtoken split: word runs OR single non-word-non-space chars. */
  def subtokens(c: Column): Column =
    regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Language ID by stopword-profile hit counting — a standard n-gram/
    * function-word heuristic over public stopword lists
    * ([[Kernels.LangProfiles]], the single source of truth the oracle
    * SQL literal lists also replay).
    *
    * This UDF is the PARITY REFERENCE for the codegen'd kernel
    * ([[KernelExpressions.lang_id]]) — not on any query path: a Scala
    * UDF over an array column pays a Catalyst-array → Seq[String]
    * conversion per row on top of the tokenize, and BatchEval boxing on
    * the way out. KernelsSpec pins equality on real documents. */
  private[graft] val langIdUdfReference = udf { (toks: Seq[String]) =>
    if (toks == null || toks.isEmpty) "und"
    else {
      var bestLang = "und"
      var bestHits = 0
      Kernels.LangProfiles.foreach { case (lang, stops) =>
        val hits = toks.count(stops.contains)
        if (hits > bestHits) { bestHits = hits; bestLang = lang }
      }
      bestLang
    }
  }
}
