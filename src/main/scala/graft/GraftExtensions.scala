package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, Expression, ExpressionInfo, Literal, Lower, Md5, RegExpReplace, StringTrim}
import org.apache.spark.sql.types.BinaryType

import graft.functions.ArrayDotProduct

/** Library INSTALLATION hook (round 8, continuation) — the
  * `SparkSessionExtensions` entry point that makes graft's native
  * expressions available to EVERY session of a deployment without code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injected functions:
  *  - `graft_dot(array<double>, array<double>) -> double` — the
  *    codegen'd embedding dot product ([[graft.functions.ArrayDotProduct]];
  *    the runtime-registry twin is [[graft.functions.VectorExprs.register]],
  *    used by sessions graft code creates itself — this hook covers
  *    sessions the USER creates).
  *  - `graft_fingerprint(string) -> string` — THE suite-wide normalized
  *    content fingerprint (md5 over whitespace-collapsed lowercase
  *    trimmed text, NULL-total) as a SQL function, built from the same
  *    Catalyst expressions the operators compose — so external SQL
  *    (`MERGE` keys, ad-hoc dedup probes) cannot drift from the dedup
  *    family's normalization contract.
  *
  * Both are pure expression injections: no planner rules, no physical
  * strategies — the library's operators deliberately stay inside
  * Catalyst's native optimization space (SURVEY §5), and the extension
  * point exists for making its expressions reachable, not for bypassing
  * the optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) {
          throw new IllegalArgumentException(
            s"graft_dot expects exactly 2 arguments, got ${exprs.length}")
        }
        ArrayDotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[Md5].getName, "graft_fingerprint"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) {
          throw new IllegalArgumentException(
            s"graft_fingerprint expects exactly 1 argument, got ${exprs.length}")
        }
        // md5(lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' '))))
        // — identical text to the operators' FpExpr (CorpusDiff, Cdc,
        // Sampling, TextOps.docFingerprint)
        Md5(Cast(Lower(StringTrim(RegExpReplace(
          Coalesce(Seq(exprs.head, Literal(""))),
          Literal("\\s+"), Literal(" ")))), BinaryType))
      }))
  }
}
