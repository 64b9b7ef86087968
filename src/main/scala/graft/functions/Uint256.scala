package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact uint256 arithmetic on decimal strings (SURVEY §7.4 hard part #2).
  *
  * The reference stores every uint256 quantity (value, gasPrice, cost,
  * difficulty) as a `big.Int.String()` decimal string
  * (`app/block/pack_tx.go:25-27`) because no fixed-width SQL numeric holds
  * 2^256. Spark's DecimalType(38) cannot either — so arithmetic features
  * (F9/F10 exactness beyond 38 digits) are custom Catalyst expressions:
  * string-in/string-out, BigInteger inside, `CodegenFallback` first (the
  * interpreted path is fine — these never sit in a hot scan loop; the
  * stored canonical form stays strings end-to-end, so nothing silently
  * casts to Decimal(38)).
  *
  * The expressions are registered in the session's FunctionRegistry by
  * [[graft.GraftExtensions]] (SparkSessionExtensions), so they are
  * reachable from SQL (`uint256_add(a, b)`) and from the Column API via
  * `call_function`.
  */
object Uint256 {

  private[functions] def big(s: UTF8String): BigInteger = new BigInteger(s.toString.trim)

  case class Uint256Add(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(l: Any, r: Any): Any =
      UTF8String.fromString(
        big(l.asInstanceOf[UTF8String]).add(big(r.asInstanceOf[UTF8String])).toString)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "uint256_add"
  }

  case class Uint256Mul(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(l: Any, r: Any): Any =
      UTF8String.fromString(
        big(l.asInstanceOf[UTF8String]).multiply(big(r.asInstanceOf[UTF8String])).toString)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "uint256_mul"
  }

  /** Three-way comparison: -1 / 0 / 1 — lexicographic string ordering on
    * decimal strings is NOT numeric ordering, which is why this exists. */
  case class Uint256Cmp(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any =
      big(l.asInstanceOf[UTF8String]).compareTo(big(r.asInstanceOf[UTF8String]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "uint256_cmp"
  }

  // Column-level API — resolves through the registry installed by
  // GraftExtensions, so these work on any session built by GraftSession.
  def add(a: Column, b: Column): Column = call_function("uint256_add", a, b)
  def mul(a: Column, b: Column): Column = call_function("uint256_mul", a, b)
  def cmp(a: Column, b: Column): Column = call_function("uint256_cmp", a, b)
  def lt(a: Column, b: Column): Column = cmp(a, b) < 0
  def gt(a: Column, b: Column): Column = cmp(a, b) > 0

  /** Exact sum of a uint256 string column — `Aggregator` with map-side
    * partial aggregation; the buffer is a decimal string so shuffle
    * serialization stays trivial. */
  object SumAggregator extends Aggregator[String, String, String] {
    override def zero: String = "0"
    override def reduce(b: String, a: String): String =
      if (a == null || a.isEmpty) b else new BigInteger(b).add(new BigInteger(a.trim)).toString
    override def merge(b1: String, b2: String): String =
      new BigInteger(b1).add(new BigInteger(b2)).toString
    override def finish(reduction: String): String = reduction
    override def bufferEncoder: Encoder[String] = Encoders.STRING
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** `uint256_sum(col)` as an untyped aggregate Column. */
  def sum(c: Column): Column =
    org.apache.spark.sql.functions.udaf(SumAggregator, Encoders.STRING).apply(c)
}
