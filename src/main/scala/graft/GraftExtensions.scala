package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashSigs, RollingHashMin, Scramble61, SimHashSig, VecDot, WordMinHashSigs}

/** Spark extensions entry point: makes every graft native expression
  * available in ANY session via configuration —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — with no code
  * changes, the idiomatic way to ship Catalyst extensions in a library.
  * (In-process callers can keep using `GraftSession.tune`, which registers
  * the same functions imperatively.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression, what: String): Int = e match {
    case f if f.foldable => f.eval().asInstanceOf[Number].intValue()
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "vec_dot(a, b)")
        VecDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash_min"),
      new ExpressionInfo(classOf[RollingHashMin].getName, "rolling_hash_min"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "rolling_hash_min(str, n)")
        RollingHashMin(exprs.head, lit(exprs(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3, "minhash_sigs(str, n, k)")
        MinHashSigs(exprs.head, lit(exprs(1), "n"), lit(exprs(2), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_minhash_sigs"),
      new ExpressionInfo(classOf[WordMinHashSigs].getName, "word_minhash_sigs"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3, "word_minhash_sigs(str, n, k)")
        WordMinHashSigs(exprs.head, lit(exprs(1), "n"), lit(exprs(2), "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "simhash_sig(str, bits)")
        SimHashSig(exprs.head, lit(exprs(1), "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("scramble61"),
      new ExpressionInfo(classOf[Scramble61].getName, "scramble61"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "scramble61(h, idx)")
        Scramble61(exprs.head, lit(exprs(1), "idx"))
      }))
  }
}
