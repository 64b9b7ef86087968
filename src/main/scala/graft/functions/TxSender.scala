package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** F13: transaction sender recovery — the reference's
  * `GetTransactionSenderAddress` / `types.Sender(signer, tx)`
  * (`app/util/util.go:131-150`), covering the four signer schemes a
  * modern chain carries:
  *
  *   - legacy / Homestead (pre-EIP-155): sigHash = keccak(rlp[nonce,
  *     gasPrice, gas, to, value, data]); v ∈ {27, 28}.
  *   - EIP-155 replay-protected legacy: sigHash over the same fields +
  *     [chainId, 0, 0]; v = chainId·2 + 35 + recId.
  *   - EIP-2930 (type 1): sigHash = keccak(0x01 ‖ rlp[chainId, nonce,
  *     gasPrice, gas, to, value, data, accessList]); v = recId.
  *   - EIP-1559 (type 2): sigHash = keccak(0x02 ‖ rlp[chainId, nonce,
  *     maxPriorityFee, maxFee, gas, to, value, data, accessList]);
  *     v = recId.
  *
  * Payload assembly ([[sigHashLegacy]] etc.) is JVM-side — it belongs to
  * the connector tier, where the reference also runs it. The ENGINE
  * primitive is [[EcRecover]]: `(sigHash, r, s, recId) → uncompressed
  * pubkey`, a codegen'd Catalyst expression (SQL `ecrecover`) that
  * composes with [[EvmFunctions.publicKeyToAddress]] to yield the
  * sender address column.
  */
object TxSender {

  /** Access-list item: (address hex, Seq(storage key hex)). */
  type AccessList = Seq[(String, Seq[String])]

  private def accessListItem(al: AccessList): Rlp.Item =
    Rlp.Lst(al.map { case (addr, keys) =>
      Rlp.Lst(Seq(Rlp.hex(addr), Rlp.Lst(keys.map(Rlp.hex))))
    })

  private def legacyFields(nonce: Long, gasPrice: String, gas: Long,
      to: String, value: String, data: Array[Byte]): Seq[Rlp.Item] =
    Seq(Rlp.int(nonce), Rlp.uint(gasPrice), Rlp.int(gas),
      Rlp.hex(to), Rlp.uint(value), Rlp.Str(data))

  /** Pre-EIP-155 (Homestead) signing hash. `to = ""` for creations. */
  def sigHashLegacy(nonce: Long, gasPrice: String, gas: Long, to: String,
      value: String, data: Array[Byte]): Array[Byte] =
    Keccak.hash256(Rlp.encode(Rlp.Lst(
      legacyFields(nonce, gasPrice, gas, to, value, data))))

  /** EIP-155 signing hash: legacy fields + [chainId, 0, 0]. */
  def sigHashEip155(chainId: Long, nonce: Long, gasPrice: String, gas: Long,
      to: String, value: String, data: Array[Byte]): Array[Byte] =
    Keccak.hash256(Rlp.encode(Rlp.Lst(
      legacyFields(nonce, gasPrice, gas, to, value, data) ++
        Seq(Rlp.int(chainId), Rlp.int(0L), Rlp.int(0L)))))

  /** EIP-2930 (type 1) signing hash: 0x01 ‖ rlp payload. */
  def sigHashEip2930(chainId: Long, nonce: Long, gasPrice: String, gas: Long,
      to: String, value: String, data: Array[Byte],
      accessList: AccessList = Nil): Array[Byte] =
    Keccak.hash256(Array(0x01.toByte) ++ Rlp.encode(Rlp.Lst(
      Rlp.int(chainId) +: legacyFields(nonce, gasPrice, gas, to, value, data)
        :+ accessListItem(accessList))))

  /** EIP-1559 (type 2) signing hash: 0x02 ‖ rlp payload with the fee-cap
    * pair replacing gasPrice. */
  def sigHashEip1559(chainId: Long, nonce: Long, maxPriorityFee: String,
      maxFee: String, gas: Long, to: String, value: String, data: Array[Byte],
      accessList: AccessList = Nil): Array[Byte] =
    Keccak.hash256(Array(0x02.toByte) ++ Rlp.encode(Rlp.Lst(Seq(
      Rlp.int(chainId), Rlp.int(nonce), Rlp.uint(maxPriorityFee),
      Rlp.uint(maxFee), Rlp.int(gas), Rlp.hex(to), Rlp.uint(value),
      Rlp.Str(data), accessListItem(accessList)))))

  /** Normalize a raw signature `v` to the recovery id: 27/28 → 0/1
    * (legacy), ≥35 → EIP-155 (v − 35 − 2·chainId), 0–3 pass through
    * (typed envelopes). Returns −1 for an inconsistent v. */
  def recIdOf(v: Long, chainId: Long = 0L): Int = v match {
    case x if x >= 35 =>
      val rid = x - 35 - 2 * chainId
      if (rid >= 0 && rid <= 3) rid.toInt else -1
    case 27 | 28 => (v - 27).toInt
    case x if x >= 0 && x <= 3 => x.toInt
    case _ => -1
  }

  /** Recover the uncompressed pubkey, JVM-side (the expression's eval). */
  def recoverPubKey(sigHash: Array[Byte], r: Array[Byte], s: Array[Byte],
      recId: Int): Array[Byte] =
    Secp256k1.recover(sigHash, new BigInteger(1, r), new BigInteger(1, s), recId)
      .orNull

  /** `ecrecover(sigHash, r, s, recId)` → 65-byte uncompressed pubkey,
    * null for an invalid signature. Compose with `publicKeyToAddress`
    * for the sender address. */
  case class EcRecover(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = children.map(_.dataType) == Seq(BinaryType, BinaryType, BinaryType, IntegerType)
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ecrecover(binary, binary, binary, int), got ${children.map(_.dataType.catalogString)}")
    }
    override def nullSafeEval(h: Any, r: Any, s: Any, v: Any): Any =
      recoverPubKey(h.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]],
        s.asInstanceOf[Array[Byte]], v.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (h, r, s, v) => {
        s"""
           |${ev.value} = graft.functions.TxSender.recoverPubKey($h, $r, $s, $v);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression, d: Expression): Expression = copy(a, b, c, d)
    override def prettyName: String = "ecrecover"
  }

  /** Column form (requires the `graft.GraftExtensions` session). */
  def ecrecover(sigHash: Column, r: Column, s: Column, recId: Column): Column =
    org.apache.spark.sql.functions.call_function("ecrecover", sigHash, r, s, recId)

  /** Column twin of [[recIdOf]]: normalize a raw signature `v` column
    * (legacy 27/28, EIP-155 ≥35, typed 0–3) to the recovery id; −1 for
    * inconsistent values (ecrecover then yields null, the engine's
    * invalid-signature signal). */
  def recIdCol(v: Column, chainId: Column): Column = {
    import org.apache.spark.sql.functions._
    val rid = when(v >= 35, v - 35 - chainId * 2)
      .when(v === 27 || v === 28, v - 27)
      .when(v >= 0 && v <= 3, v)
      .otherwise(lit(-1L))
    // clamp BEFORE the int cast like recIdOf does: an out-of-int-range v
    // must yield -1, not an ANSI CAST_OVERFLOW that fails the whole query
    when(rid.between(0, 3), rid).otherwise(lit(-1L)).cast("int")
  }

  /** F13 end-to-end as columns: sender address from signature columns. */
  def senderAddress(sigHash: Column, r: Column, s: Column, recId: Column): Column =
    EvmFunctions.publicKeyToAddress(ecrecover(sigHash, r, s, recId))
}
