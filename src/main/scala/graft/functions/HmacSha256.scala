package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side HMAC helper. One Mac instance per thread; re-keyed per
  * call (SecretKeySpec is cheap; Mac.getInstance is not).
  */
object GraftCrypto {
  private val macs: ThreadLocal[Mac] =
    ThreadLocal.withInitial(() => Mac.getInstance("HmacSHA256"))

  private val hexChars = "0123456789abcdef".toCharArray

  def hmacSha256Hex(key: Array[Byte], msg: Array[Byte]): UTF8String = {
    val mac = macs.get()
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    val digest = mac.doFinal(msg)
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      out(i * 2) = hexChars((digest(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = hexChars(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Keyed hash for pseudonymous IDs: HMAC-SHA256(key, utf8(msg)) as
  * lowercase hex — the reference's `anon_id` algorithm
  * (cumulus_etl/deid/codebook.py:205-217, "same algorithm used by
  * Microsoft's anonymization tools for FHIR"). Spark's builtin `sha2` is
  * unkeyed, hence this custom expression; codegen emits a direct static
  * call so it stays inside whole-stage codegen.
  */
case class HmacSha256Hex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256_hex"

  override protected def nullSafeEval(key: Any, msg: Any): Any =
    GraftCrypto.hmacSha256Hex(
      key.asInstanceOf[Array[Byte]],
      msg.asInstanceOf[UTF8String].getBytes
    )

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (k, m) =>
        s"graft.functions.GraftCrypto.hmacSha256Hex($k, $m.getBytes())"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object HmacSha256Hex {
  /** hmac_sha256_hex(saltBytes, msg) as a Column. */
  def apply(key: Array[Byte], msg: Column): Column =
    GraftColumnBridge.column(
      HmacSha256Hex(Literal(key, BinaryType),
        GraftColumnBridge.expression(msg)))
}
