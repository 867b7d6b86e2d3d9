package graft

import graft.functions.{FloatVecCosine, HmacSha256Hex}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring: registers the engine's custom Catalyst
  * expressions for SQL use, so `spark.sql("SELECT hmac_sha256_hex(...)")`
  * works alongside the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — a static
  * conf, so it must be set when the SparkContext is first created.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** The registrations, exposed so an existing session can install them
    * into its own registry (tests; notebooks attached to a running
    * context): `GraftExtensions.registerAll(spark)`.
    */
  val functions: Seq[FunctionDescription] = Seq(
    (
      new FunctionIdentifier("hmac_sha256_hex"),
      new ExpressionInfo(classOf[HmacSha256Hex].getName, "hmac_sha256_hex"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "hmac_sha256_hex(keyBinary, msgString)")
        HmacSha256Hex(children.head, children(1))
      }
    ),
    (
      new FunctionIdentifier("fvec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "fvec_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "fvec_cosine(arrayFloat, arrayFloat)")
        FloatVecCosine(children.head, children(1))
      }
    )
  )

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
