package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar layer (SURVEY §2.8, F1–F17) as Column builders over built-in
  * Catalyst expressions — no UDFs, everything codegen-friendly.
  *
  * These are what make engine output byte-identical to the reference's
  * JSON/GraphQL API surface. */
object EvmFunctions {

  val ZeroAddress = "0x" + "0" * 40
  private val Zero32Hex = "00" * 32

  /** F1: bytes → `"0x…"` lowercase hex, empty/null → `""`
    * (`app/data/tx.go:36-39`, `app/data/block.go:38-41`). */
  def hexEncode(c: Column): Column =
    when(length(c) > 0, concat(lit("0x"), lower(hex(c)))).otherwise(lit(""))

  /** F2: event data of exactly 32 zero bytes serializes as `""`
    * (`app/data/event.go:33`), composed with the F1 empty-guard. */
  def eventDataJson(c: Column): Column =
    when(lower(hex(c)) === Zero32Hex, lit("")).otherwise(hexEncode(c))

  /** F3: `"0x…"` (or bare hex) → bytes (`app/pubsub/event.go:98-100`). */
  def hexDecode(c: Column): Column =
    unhex(regexp_replace(c, "^0x", ""))

  /** F4: decimal string → uint64 (`app/common/common.go:51-62`). Invalid
    * input → null (the API layer rejects before planning, mirroring the
    * reference's error return). `try_cast`, not `cast`: under Spark 4's
    * default ANSI mode a plain cast THROWS on malformed input — a single
    * bad row would fail a whole query instead of being rejectable. */
  def parseNumber(c: Column): Column = c.try_cast(LongType)

  /** F7: address shape validation (`app/util/util.go:30-40`). */
  def isValidAddress(c: Column): Column = c.rlike("^0x[0-9a-fA-F]{40}$")

  /** F7 (hash flavor): `0x` + 64 hex, the inline checks at rest.go:100,233. */
  def isValidHash(c: Column): Column = c.rlike("^0x[0-9a-fA-F]{64}$")

  /** F8: zero-address test (`app/util/util.go:43-57`). */
  def isZeroAddress(c: Column): Column = lower(c) === ZeroAddress

  /** F9: wei decimal-string → token units at `decimals` precision
    * (`app/util/util.go:60-74` ToDecimal). DOUBLE carries ~15 significant
    * digits — same tradeoff the reference's float64 path takes; exact
    * uint256 arithmetic stays in string space (see Uint256 expressions). */
  def toDecimal(c: Column, decimals: Int = 18): Column =
    c.cast(DoubleType) / math.pow(10, decimals)

  /** F10: gasLimit × gasPrice as an exact decimal string
    * (`app/util/util.go:102-105` CalcGasCost). DECIMAL(18)×DECIMAL(18)
    * stays exact for every realistic gas/gasprice pair. */
  def calcGasCost(gas: Column, gasPrice: Column): Column =
    (gasPrice.cast(DecimalType(18, 0)) * gas.cast(DecimalType(18, 0))).cast(StringType)

  /** F13/F14 helper: the populated side of the `to` XOR `contract` pair
    * (`app/block/pack_tx.go:16-48`). */
  def targetAddress(to: Column, contract: Column): Column =
    when(contract =!= "", contract).otherwise(to)

  /** F14: conditional tx JSON shape — emits `contract` for creations and
    * `to` otherwise, all numerics stringified like the reference
    * (`app/data/tx.go:42-52`, F15 at `app/rest/graph/data.go:54-59`). */
  def txJson(
      hash: Column, from: Column, to: Column, contract: Column, value: Column,
      data: Column, gas: Column, gasPrice: Column, cost: Column, nonce: Column,
      state: Column, blockHash: Column): Column = {
    val common = Seq(
      hash.as("hash"), from.as("from"))
    val tail = Seq(
      value.as("value"), hexEncode(data).as("data"),
      gas.cast(StringType).as("gas"), gasPrice.as("gasPrice"), cost.as("cost"),
      nonce.cast(StringType).as("nonce"), state.cast(StringType).as("state"),
      blockHash.as("blockHash"))
    when(contract =!= "",
      to_json(struct(common ++ (contract.as("contract") +: tail): _*)))
    .otherwise(
      to_json(struct(common ++ (to.as("to") +: tail): _*)))
  }

  /** Block JSON document (`app/data/block.go:37-61`): the reference
    * printf-builds this shape field-by-field — `size` renders through
    * Go's `%f` (six fixed decimals; Java's Formatter agrees exactly when
    * the value has ≤6 significant decimals, which block sizes do), and
    * `extraData` gets the F1 empty-suppression. */
  def blockJson(
      hash: Column, number: Column, time: Column, parentHash: Column,
      difficulty: Column, gasUsed: Column, gasLimit: Column, nonce: Column,
      miner: Column, size: Column, stateRootHash: Column, uncleHash: Column,
      txRootHash: Column, receiptRootHash: Column, extraData: Column): Column =
    format_string(
      "{\"hash\":\"%s\",\"number\":%d,\"time\":%d,\"parentHash\":\"%s\"," +
        "\"difficulty\":\"%s\",\"gasUsed\":%d,\"gasLimit\":%d,\"nonce\":\"%s\"," +
        "\"miner\":\"%s\",\"size\":%f,\"stateRootHash\":\"%s\",\"uncleHash\":\"%s\"," +
        "\"txRootHash\":\"%s\",\"receiptRootHash\":\"%s\",\"extraData\":\"%s\"}",
      hash, number, time, parentHash, difficulty, gasUsed, gasLimit, nonce,
      miner, size, stateRootHash, uncleHash, txRootHash, receiptRootHash,
      hexEncode(extraData))

  /** Event JSON document (`app/data/event.go:30-45`): topics render as a
    * JSON string array with no separator spaces, data gets the F2
    * zero-word suppression composed with the F1 empty-guard. */
  def eventJson(
      origin: Column, index: Column, topics: Column, data: Column,
      txHash: Column, blockHash: Column): Column =
    format_string(
      "{\"origin\":\"%s\",\"index\":%d,\"topics\":[%s],\"data\":\"%s\"," +
        "\"txHash\":\"%s\",\"blockHash\":\"%s\"}",
      origin, index,
      array_join(transform(topics, t => concat(lit("\""), t, lit("\""))), ","),
      eventDataJson(data), txHash, blockHash)

  /** F11: keccak256 digest of a binary column (custom expression —
    * [[Keccak.Keccak256]], registered as SQL `keccak256`). */
  def keccak256(c: Column): Column =
    org.apache.spark.sql.functions.call_function("keccak256", c)

  /** F11: `PublicKeyBytesToAddress` (`app/util/util.go:18-27`): drop the
    * 0x04 prefix of an uncompressed pubkey, keccak, keep the last 20
    * bytes, hex with 0x. */
  def publicKeyToAddress(pubkey: Column): Column = {
    val body = when(length(pubkey) === 65, substring(pubkey, 2, 64)).otherwise(pubkey)
    concat(lit("0x"), lower(hex(substring(keccak256(body), 13, 20))))
  }

  /** F12: `SigRSV` (`app/util/util.go:108-129`): split a 65-byte signature
    * into (r, s, v) — v normalized from the 27/28 convention. */
  def sigR(sig: Column): Column = substring(sig, 1, 32)
  def sigS(sig: Column): Column = substring(sig, 33, 32)
  def sigV(sig: Column): Column = {
    val raw = conv(hex(substring(sig, 65, 1)), 16, 10).cast(IntegerType)
    when(raw >= 27, raw - 27).otherwise(raw)
  }

  /** F16: case-insensitive exact match (`app/pubsub/subscription.go:141-151`
    * CheckSimilarity — regex `(?i)^(x)$` ≡ lowercase equality). */
  def checkSimilarity(a: Column, b: Column): Column = lower(a) === lower(b)

  /** F17: pad a topics prefix list to 4 with `""` — driver-side helper for
    * the GraphQL binding (`app/rest/graph/data.go:210-231`). */
  def fillUpTopicArray(prefix: Seq[String]): Seq[String] =
    (prefix ++ Seq.fill(4)("")).take(4)

  /** F5: RangeChecker (`app/common/common.go:66-84`): inclusive range no
    * wider than `maxWidth`. API-layer guardrail — constant-folds before
    * planning so every interactive ranged query stays a 1–2 partition scan. */
  def checkRange(from: Long, to: Long, maxWidth: Long): Boolean =
    to >= from && (to - from + 1) <= maxWidth
}
