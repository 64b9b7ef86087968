package graft.api

import scala.collection.immutable.ListMap

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}

/** The `/v1/graphql` tier (`app/rest/graph/schema.graphqls`, served by
  * gqlgen at `rest.go:861-886`): a recursive-descent parser for the
  * subset of GraphQL the reference's flat schema can express — named or
  * anonymous `query` operations over scalar-argument fields with
  * one-level selection sets, String/Int/[String] literals and
  * `$variable` references — plus an executor whose 31 resolvers delegate
  * to the SAME [[QueryService]] arms the REST tier uses
  * (`schema.resolvers.go:21-491` delegates to the same db.Get* calls).
  *
  * Output shaping mirrors `app/rest/graph/data.go:40-200`: every numeric
  * rendered as a decimal string except Float `size` and Int counts,
  * `to` XOR `contract` on transactions, hex data with the F1 empty guard
  * (and the F2 zero-word suppression on event data), and empty results
  * erroring as `Found nothing` — gqlgen's error envelope
  * `{"errors":[{"message":…,"path":[…]}],"data":null}`. */
final class GraphQl(service: QueryService) {
  import GraphQl._

  private val mapper = new ObjectMapper()

  /** Execute one POST body (`{"query":…,"variables":…}`) to the JSON
    * response envelope. Always 200-shaped, as gqlgen serves it. */
  def execute(body: String): String = {
    val (query, vars) =
      try {
        val root = mapper.readTree(body)
        val q = if (root.hasNonNull("query")) root.get("query").asText() else ""
        val v = if (root.hasNonNull("variables"))
          mapper.convertValue(root.get("variables"), classOf[java.util.Map[String, Object]])
            .asInstanceOf[java.util.Map[String, Any]]
        else java.util.Collections.emptyMap[String, Any]()
        (q, v)
      } catch { case _: Exception => return errorJson("invalid request body") }
    parse(query, vars) match {
      case Left(msg) => errorJson(msg)
      case Right(fields) =>
        val data = new java.util.LinkedHashMap[String, Any]()
        for (f <- fields) {
          val resolved: Either[String, Any] = f.name match {
            case "__typename" => Right("Query")
            case "__schema" | "__type" =>
              val sels = f.selections.collectFirst { case Intro(s) => s }
                .getOrElse(Seq.empty)
              if (sels.isEmpty) Left(s"${f.name}: selection set required")
              else if (f.name == "__schema") GraphQlIntrospection.schema(sels)
              else GraphQlIntrospection.typeByName(f.args, sels)
            case _ => resolve(f)
          }
          resolved match {
            case Left(msg) => return errorJson(msg, f.alias)
            case Right(value) => data.put(f.alias, value)
          }
        }
        mapper.writeValueAsString(
          java.util.Collections.singletonMap("data", data))
    }
  }

  private def errorJson(message: String, path: String = null): String = {
    val err = new java.util.LinkedHashMap[String, Any]()
    err.put("message", message)
    if (path != null) err.put("path", java.util.List.of(path))
    val root = new java.util.LinkedHashMap[String, Any]()
    root.put("errors", java.util.List.of(err))
    root.put("data", null)
    mapper.writeValueAsString(root)
  }

  // ---- resolvers --------------------------------------------------------

  private def resolve(f: Field): Either[String, Any] = {
    def s(k: String): Either[String, String] = f.args.get(k) match {
      case Some(v: String) => Right(v)
      case Some(other) => Left(s"argument $k: expected a string, got $other")
      case None => Left(s"missing argument $k")
    }
    def n(k: String): Either[String, Long] = s(k).flatMap(v =>
      try Right(java.lang.Long.parseLong(v))
      catch { case _: NumberFormatException => Left(s"argument $k: bad number '$v'") })
    def i(k: String): Either[String, Int] = f.args.get(k) match {
      case Some(v: Long) => Right(v.toInt)
      case Some(v: String) => Left(s"argument $k: expected an Int, got '$v'")
      case _ => Left(s"missing argument $k")
    }
    def topics: Either[String, Map[Int, String]] = f.args.get("topics") match {
      case Some(xs: Seq[_]) =>
        Right(xs.zipWithIndex.collect { case (t: String, k) => k -> t }.toMap)
      case _ => Left("missing argument topics")
    }
    def range(run: (Long, Long) => Either[String, DataFrame]) =
      for { lo <- n("from"); hi <- n("to"); df <- run(lo, hi) } yield df
    def acctRange(run: (String, Long, Long) => Either[String, DataFrame]) =
      for { a <- s("account"); lo <- n("from"); hi <- n("to"); df <- run(a, lo, hi) } yield df
    def pairRange(run: (String, String, Long, Long) => Either[String, DataFrame]) =
      for {
        fa <- s("fromAccount"); ta <- s("toAccount")
        lo <- n("from"); hi <- n("to"); df <- run(fa, ta, lo, hi)
      } yield df

    val svc = service
    val out: Either[String, Result] = f.name match {
      case "blockByHash" => s("hash").flatMap(svc.blockByHash).map(One(BlockKind, _))
      case "blockByNumber" => n("number").flatMap(svc.blockByNumber).map(One(BlockKind, _))
      case "blocksByNumberRange" => range(svc.blocksByNumberRange).map(Many(BlockKind, _))
      case "blocksByTimeRange" => range(svc.blocksByTimeRange).map(Many(BlockKind, _))

      case "transaction" => s("hash").flatMap(svc.transactionByHash).map(One(TxKind, _))
      case "transactionsByBlockHash" =>
        s("hash").flatMap(svc.transactionsByBlockHash).map(Many(TxKind, _))
      case "transactionCountByBlockHash" =>
        s("hash").flatMap(svc.transactionCountByBlockHash).map(Count(_))
      case "transactionsByBlockNumber" =>
        n("number").flatMap(svc.transactionsByBlockNumber).map(Many(TxKind, _))
      case "transactionCountByBlockNumber" =>
        n("number").flatMap(svc.transactionCountByBlockNumber).map(Count(_))
      case "transactionsFromAccountByNumberRange" =>
        acctRange(svc.transactionsFromAccountByNumberRange).map(Many(TxKind, _))
      case "transactionCountFromAccountByNumberRange" =>
        acctRange(svc.transactionCountFromAccountByNumberRange).map(Count(_))
      case "transactionsFromAccountByTimeRange" =>
        acctRange(svc.transactionsFromAccountByTimeRange).map(Many(TxKind, _))
      case "transactionCountFromAccountByTimeRange" =>
        acctRange(svc.transactionCountFromAccountByTimeRange).map(Count(_))
      case "transactionsToAccountByNumberRange" =>
        acctRange(svc.transactionsToAccountByNumberRange).map(Many(TxKind, _))
      case "transactionCountToAccountByNumberRange" =>
        acctRange(svc.transactionCountToAccountByNumberRange).map(Count(_))
      case "transactionsToAccountByTimeRange" =>
        acctRange(svc.transactionsToAccountByTimeRange).map(Many(TxKind, _))
      case "transactionCountToAccountByTimeRange" =>
        acctRange(svc.transactionCountToAccountByTimeRange).map(Count(_))
      case "transactionsBetweenAccountsByNumberRange" =>
        pairRange(svc.transactionsBetweenAccountsByNumberRange).map(Many(TxKind, _))
      case "transactionCountBetweenAccountsByNumberRange" =>
        pairRange(svc.transactionCountBetweenAccountsByNumberRange).map(Count(_))
      case "transactionsBetweenAccountsByTimeRange" =>
        pairRange(svc.transactionsBetweenAccountsByTimeRange).map(Many(TxKind, _))
      case "transactionCountBetweenAccountsByTimeRange" =>
        pairRange(svc.transactionCountBetweenAccountsByTimeRange).map(Count(_))
      case "contractsCreatedFromAccountByNumberRange" =>
        acctRange(svc.contractCreationsFromAccount).map(Many(TxKind, _))
      case "contractsCreatedFromAccountByTimeRange" =>
        acctRange(svc.contractCreationsFromAccountByTimeRange).map(Many(TxKind, _))
      case "transactionFromAccountWithNonce" =>
        (for {
          a <- s("account"); nn <- n("nonce")
          df <- svc.transactionFromAccountWithNonce(a, nn)
        } yield df).map(One(TxKind, _))

      case "eventsFromContractByNumberRange" =>
        (for { c <- s("contract"); lo <- n("from"); hi <- n("to")
               df <- svc.eventsFromContractByNumberRange(c, lo, hi) } yield df)
          .map(Many(EventKind, _))
      case "eventsFromContractByTimeRange" =>
        (for { c <- s("contract"); lo <- n("from"); hi <- n("to")
               df <- svc.eventsFromContractByTimeRange(c, lo, hi) } yield df)
          .map(Many(EventKind, _))
      case "eventsByBlockHash" =>
        s("hash").flatMap(svc.eventsByBlockHash).map(Many(EventKind, _))
      case "eventsByTxHash" =>
        s("hash").flatMap(svc.eventsByTransactionHash).map(Many(EventKind, _))
      case "eventsFromContractWithTopicsByNumberRange" =>
        (for { c <- s("contract"); lo <- n("from"); hi <- n("to"); ts <- topics
               df <- svc.eventsFromContractWithTopics(c, lo, hi, ts) } yield df)
          .map(Many(EventKind, _))
      case "eventsFromContractWithTopicsByTimeRange" =>
        (for { c <- s("contract"); lo <- n("from"); hi <- n("to"); ts <- topics
               df <- svc.eventsFromContractWithTopicsByTimeRange(c, lo, hi, ts) } yield df)
          .map(Many(EventKind, _))
      case "lastXEventsFromContract" =>
        (for { c <- s("contract"); x <- i("x")
               df <- svc.lastEventsFromContract(c, x) } yield df)
          .map(Many(EventKind, _))
      case "eventByBlockHashAndLogIndex" =>
        (for { h <- s("hash"); idx <- n("index")
               df <- svc.eventByBlockHashAndLogIndex(h, idx) } yield df)
          .map(One(EventKind, _))
      case "eventByBlockNumberAndLogIndex" =>
        (for { nn <- n("number"); idx <- n("index")
               df <- svc.eventByBlockNumberAndLogIndex(nn, idx) } yield df)
          .map(One(EventKind, _))

      case other => Left(s"unknown field: $other")
    }

    out.flatMap {
      case Count(df) =>
        if (f.selections.nonEmpty) Left(s"${f.name}: Int fields take no selection set")
        else Right(Long.box(df.collect().head.getLong(0)))
      case One(kind, df) =>
        if (f.selections.isEmpty) Left(s"${f.name}: selection set required")
        else df.collect().headOption match {
          case None => Left("Found nothing") // data.go:44,95,158
          case Some(row) => shape(kind, row, f.selections).map(toJavaMap)
        }
      case Many(kind, df) =>
        if (f.selections.isEmpty) Left(s"${f.name}: selection set required")
        else {
          val rows = df.collect()
          if (rows.isEmpty) Left("Found nothing") // data.go:78-80,140-144,184-188
          else {
            val shaped = rows.toSeq.map(shape(kind, _, f.selections))
            shaped.collectFirst { case Left(m) => m } match {
              case Some(m) => Left(m)
              case None =>
                val list = new java.util.ArrayList[Any](shaped.size)
                shaped.foreach { case Right(m) => list.add(toJavaMap(m)); case _ => }
                Right(list)
            }
          }
        }
    }
  }

  private def toJavaMap(m: ListMap[String, Any]): java.util.Map[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    m.foreach { case (k, v) => out.put(k, v) }
    out
  }

  // ---- output shaping (data.go:40-200) ----------------------------------

  private def hexOrEmpty(b: Array[Byte]): String =
    if (b == null || b.isEmpty) "" else "0x" + b.map("%02x".format(_)).mkString

  private def shape(kind: Kind, row: Row,
      selections: Seq[Selection]): Either[String, ListMap[String, Any]] = {
    def fieldValue(sel: String): Either[String, Any] = (kind, sel) match {
      case (_, "__typename") => Right(kind.name)
      case (BlockKind, "hash") => Right(row.getAs[String]("hash"))
      case (BlockKind, "number") => Right(row.getAs[Long]("number").toString)
      case (BlockKind, "time") => Right(row.getAs[Long]("time").toString)
      case (BlockKind, "parentHash") => Right(row.getAs[String]("parenthash"))
      case (BlockKind, "difficulty") => Right(row.getAs[String]("difficulty"))
      case (BlockKind, "gasUsed") => Right(row.getAs[Long]("gasused").toString)
      case (BlockKind, "gasLimit") => Right(row.getAs[Long]("gaslimit").toString)
      case (BlockKind, "nonce") => Right(row.getAs[String]("nonce"))
      case (BlockKind, "miner") => Right(row.getAs[String]("miner"))
      case (BlockKind, "size") => Right(Double.box(row.getAs[Double]("size")))
      case (BlockKind, "stateRootHash") => Right(row.getAs[String]("stateroothash"))
      case (BlockKind, "uncleHash") => Right(row.getAs[String]("unclehash"))
      case (BlockKind, "txRootHash") => Right(row.getAs[String]("txroothash"))
      case (BlockKind, "receiptRootHash") => Right(row.getAs[String]("receiptroothash"))
      case (BlockKind, "extraData") => Right(hexOrEmpty(row.getAs[Array[Byte]]("extradata")))

      case (TxKind, "hash") => Right(row.getAs[String]("hash"))
      case (TxKind, "from") => Right(row.getAs[String]("from"))
      // to XOR contract (data.go:103-133): a creation blanks `to`
      case (TxKind, "to") =>
        Right(if (row.getAs[String]("contract").startsWith("0x")) ""
          else row.getAs[String]("to"))
      case (TxKind, "contract") =>
        Right(if (row.getAs[String]("contract").startsWith("0x"))
          row.getAs[String]("contract") else "")
      case (TxKind, "value") => Right(row.getAs[String]("value"))
      case (TxKind, "data") => Right(hexOrEmpty(row.getAs[Array[Byte]]("data")))
      case (TxKind, "gas") => Right(row.getAs[Long]("gas").toString)
      case (TxKind, "gasPrice") => Right(row.getAs[String]("gasprice"))
      case (TxKind, "cost") => Right(row.getAs[String]("cost"))
      case (TxKind, "nonce") => Right(row.getAs[Long]("nonce").toString)
      case (TxKind, "state") => Right(row.getAs[Int]("state").toString)
      case (TxKind, "blockHash") => Right(row.getAs[String]("blockhash"))

      case (EventKind, "origin") => Right(row.getAs[String]("origin"))
      case (EventKind, "index") => Right(row.getAs[Int]("index").toString)
      case (EventKind, "topics") =>
        val list = new java.util.ArrayList[Any]()
        row.getAs[Seq[String]]("topics").foreach(list.add)
        Right(list)
      case (EventKind, "data") => // F2 zero-word suppression (data.go:163-166)
        val b = row.getAs[Array[Byte]]("data")
        Right(if (b != null && b.length == 32 && b.forall(_ == 0)) "" else hexOrEmpty(b))
      case (EventKind, "txHash") => Right(row.getAs[String]("txhash"))
      case (EventKind, "blockHash") => Right(row.getAs[String]("blockhash"))

      case (k, other) => Left(s"unknown field $other on ${k.name}")
    }
    // CollectFields: leaves respond under their alias; guarded groups
    // (from fragments) apply only when the guard matches this entity
    // type, recursively
    def fold(acc: Either[String, ListMap[String, Any]],
        sels: Seq[Selection]): Either[String, ListMap[String, Any]] =
      sels.foldLeft(acc) {
        case (a, Leaf(n, alias)) =>
          for { m <- a; v <- fieldValue(n) } yield m.updated(alias, v)
        case (a, Guarded(cond, sub)) =>
          if (cond == "*" || cond == kind.name) fold(a, sub) else a
      }
    fold(Right(ListMap.empty), selections)
  }
}

object GraphQl {

  sealed abstract class Kind(val name: String)
  case object BlockKind extends Kind("Block")
  case object TxKind extends Kind("Transaction")
  case object EventKind extends Kind("Event")

  private sealed trait Result
  private final case class One(kind: Kind, df: DataFrame) extends Result
  private final case class Many(kind: Kind, df: DataFrame) extends Result
  private final case class Count(df: DataFrame) extends Result

  /** One requested top-level field: response key (`alias`), schema field
    * (`name`), arguments resolved (variables substituted), and its
    * entity selection set (leaves + fragment-derived guarded groups). */
  final case class Field(name: String, alias: String, args: Map[String, Any],
    selections: Seq[Selection])

  /** An entity-level selection: a scalar leaf (respond under `alias`),
    * or a type-guarded group spliced from a named/inline fragment —
    * applied only when the guard matches the resolved entity type, the
    * spec's CollectFields rule. */
  sealed trait Selection
  final case class Leaf(name: String, alias: String) extends Selection
  final case class Guarded(cond: String, sels: Seq[Selection]) extends Selection

  /** An introspection selection tree — unlike the flat entity tier,
    * `__schema`/`__type` selections nest arbitrarily (`types { fields {
    * type { ofType { … } } } }`), so their subtree is lowered into this
    * recursive form and resolved by [[GraphQlIntrospection]]. */
  sealed trait ISel
  final case class IField(name: String, alias: String, args: Map[String, Any],
    sels: Seq[ISel]) extends ISel
  final case class IGuard(cond: String, sels: Seq[ISel]) extends ISel

  /** Wrapper carrying an introspection subtree through [[Field]]. */
  final case class Intro(sels: Seq[ISel]) extends Selection

  private val KnownTypes = Set("Query", "Block", "Transaction", "Event")

  /** Parse a spec-shaped document against the reference's flat schema:
    * named/anonymous `query` operations, `fragment F on T` definitions
    * in any document position (spread with `...F`, plus inline
    * `... on T { }` fragments), field aliases, `__typename`, the
    * `@include(if:)` / `@skip(if:)` execution directives (on fields and
    * fragment spreads, Boolean literals or variables), and
    * String/Int/Boolean/[String] literals or `$variable` references.
    * Commas and `#` comments are ignorable, per the GraphQL spec. */
  def parse(query: String,
      variables: java.util.Map[String, Any]): Either[String, Seq[Field]] =
    try {
      val (ops, frags) = new Parser(query, variables).document()
      Right(new Expander(frags).topLevel(ops, Set.empty))
    } catch { case e: GqlSyntaxError => Left(e.getMessage) }

  private final class GqlSyntaxError(msg: String) extends RuntimeException(msg)

  // ---- raw document tree (pre-fragment-expansion) -----------------------

  private type Directives = Seq[(String, Map[String, Any])]
  private sealed trait RawSel { def dirs: Directives }
  private final case class RawField(alias: String, name: String,
    args: Map[String, Any], sels: Seq[RawSel], dirs: Directives) extends RawSel
  private final case class RawSpread(name: String, dirs: Directives) extends RawSel
  private final case class RawInline(cond: String, sels: Seq[RawSel],
    dirs: Directives) extends RawSel

  /** Splices fragment definitions into the operation: top-level spreads
    * must guard `Query` (others can never match and vanish, the
    * CollectFields rule); entity-level spreads become [[Guarded]] groups
    * resolved against the actual entity type at shaping time. Unknown
    * fragment names, unknown guard types, and spread cycles are
    * document errors. */
  private final class Expander(frags: Map[String, (String, Seq[RawSel])]) {
    private def fragment(n: String, expanding: Set[String]): (String, Seq[RawSel]) = {
      if (expanding(n)) throw new GqlSyntaxError(s"fragment cycle through '$n'")
      frags.getOrElse(n, throw new GqlSyntaxError(s"unknown fragment '$n'"))
    }
    private def checkCond(cond: String): String =
      if (KnownTypes(cond)) cond
      else throw new GqlSyntaxError(s"unknown type '$cond' in fragment condition")

    /** Spec §5.7 / CollectFields: `@skip(if: true)` or
      * `@include(if: false)` excludes the selection; with both present a
      * selection survives only skip=false AND include=true. Only these
      * two directives exist in the schema. */
    private def included(dirs: Directives): Boolean = dirs.forall { case (d, args) =>
      if (d != "skip" && d != "include")
        throw new GqlSyntaxError(s"unknown directive '@$d'")
      val flag = args.get("if") match {
        case Some(b: Boolean) => b
        case _ => throw new GqlSyntaxError(
          s"directive @$d requires a Boolean 'if' argument")
      }
      if (d == "skip") !flag else flag
    }

    def topLevel(sels: Seq[RawSel], expanding: Set[String]): Seq[Field] =
      sels.filter(s => included(s.dirs)).flatMap {
        case RawField(alias, n @ ("__schema" | "__type"), args, sub, _) =>
          // introspection subtrees nest arbitrarily and guard META type
          // names — lowered recursively, resolved by GraphQlIntrospection
          Seq(Field(n, alias, args, Seq(Intro(intro(sub, expanding)))))
        case RawField(alias, n, args, sub, _) =>
          Seq(Field(n, alias, args, entity(sub, expanding)))
        case RawSpread(n, _) =>
          val (cond, body) = fragment(n, expanding)
          if (checkCond(cond) == "Query") topLevel(body, expanding + n)
          else Seq.empty
        case RawInline(cond, body, _) =>
          if (cond == null || checkCond(cond) == "Query") topLevel(body, expanding)
          else Seq.empty
      }

    private def entity(sels: Seq[RawSel], expanding: Set[String]): Seq[Selection] =
      sels.filter(s => included(s.dirs)).map {
        case RawField(alias, n, args, sub, _) =>
          if (args.nonEmpty)
            throw new GqlSyntaxError(s"field '$n' takes no arguments here")
          if (sub.nonEmpty)
            throw new GqlSyntaxError("nested selection sets are not in the schema")
          Leaf(n, alias)
        case RawSpread(n, _) =>
          val (cond, body) = fragment(n, expanding)
          Guarded(checkCond(cond), entity(body, expanding + n))
        case RawInline(cond, body, _) =>
          Guarded(if (cond == null) "*" else checkCond(cond), entity(body, expanding))
      }

    /** Recursive lowering for introspection subtrees: nested selection
      * sets and field arguments are legal, and fragment conditions may
      * name META types (`… on __Type`) — an unknown condition simply
      * never matches (the runtime type of every introspection position
      * is concrete), mirroring CollectFields rather than erroring. */
    private def intro(sels: Seq[RawSel], expanding: Set[String]): Seq[ISel] =
      sels.filter(s => included(s.dirs)).map {
        case RawField(alias, n, args, sub, _) =>
          IField(n, alias, args, intro(sub, expanding))
        case RawSpread(n, _) =>
          val (cond, body) = fragment(n, expanding)
          IGuard(cond, intro(body, expanding + n))
        case RawInline(cond, body, _) =>
          IGuard(if (cond == null) "*" else cond, intro(body, expanding))
      }
  }

  private final class Parser(src: String, variables: java.util.Map[String, Any]) {
    private var pos = 0

    private def fail(msg: String): Nothing =
      throw new GqlSyntaxError(s"syntax error at offset $pos: $msg")

    private def skip(): Unit = {
      var moving = true
      while (moving) {
        moving = false
        while (pos < src.length && (src(pos).isWhitespace || src(pos) == ',')) {
          pos += 1; moving = true
        }
        if (pos < src.length && src(pos) == '#') {
          while (pos < src.length && src(pos) != '\n') pos += 1
          moving = true
        }
      }
    }

    private def peek(): Char = { skip(); if (pos < src.length) src(pos) else '\u0000' }

    private def expect(c: Char): Unit = {
      if (peek() != c) fail(s"expected '$c'")
      pos += 1
    }

    private def name(): String = {
      skip()
      val start = pos
      while (pos < src.length &&
        (src(pos).isLetterOrDigit || src(pos) == '_')) pos += 1
      if (pos == start) fail("expected a name")
      src.substring(start, pos)
    }

    private def value(): Any = peek() match {
      case '"' =>
        pos += 1
        val sb = new StringBuilder
        while (pos < src.length && src(pos) != '"') {
          if (src(pos) == '\\' && pos + 1 < src.length) pos += 1
          sb.append(src(pos)); pos += 1
        }
        if (pos >= src.length) fail("unterminated string")
        pos += 1
        sb.toString
      case '$' =>
        pos += 1
        val v = name()
        if (variables == null || !variables.containsKey(v)) fail(s"undefined variable $$$v")
        variables.get(v) match {
          case l: java.util.List[_] =>
            import scala.jdk.CollectionConverters._
            l.asScala.toSeq
          case n: java.lang.Number if !n.isInstanceOf[java.lang.Double] => n.longValue()
          case other => other
        }
      case '[' =>
        pos += 1
        val items = Vector.newBuilder[Any]
        while (peek() != ']') items += value()
        pos += 1
        items.result()
      case c if c == '-' || c.isDigit =>
        val start = pos
        pos += 1
        while (pos < src.length && src(pos).isDigit) pos += 1
        val text = src.substring(start, pos)
        try text.toLong // a lone '-' or out-of-Long literal is a SYNTAX error,
        catch {         // not an exception escaping the envelope
          case _: NumberFormatException => fail(s"bad integer literal '$text'")
        }
      case c if c.isLetter => name() match {
        case "true" => true
        case "false" => false
        case other => fail(s"unexpected enum-like value '$other'")
      }
      case _ => fail("expected a value")
    }

    /** Zero or more `@directive(args…)` annotations. */
    private def directives(): Seq[(String, Map[String, Any])] = {
      val ds = Vector.newBuilder[(String, Map[String, Any])]
      while (peek() == '@') {
        pos += 1
        ds += name() -> arguments()
      }
      ds.result()
    }

    private def arguments(): Map[String, Any] =
      if (peek() != '(') Map.empty
      else {
        pos += 1
        val args = Map.newBuilder[String, Any]
        while (peek() != ')') {
          val k = name()
          expect(':')
          args += k -> value()
        }
        pos += 1
        args.result()
      }

    /** `{ sel… }`: aliased fields with optional arguments and nested
      * sets, `...Fragment` spreads, and `... on Type { }` / `... { }`
      * inline fragments. Schema-level checks (where nesting or
      * arguments are legal) happen in the [[Expander]]. */
    private def selectionSet(): Seq[RawSel] = {
      expect('{')
      val sels = Vector.newBuilder[RawSel]
      while (peek() != '}') {
        if (peek() == '.') {
          // the three spread dots must be contiguous (no skip between)
          if (pos + 2 >= src.length || src(pos + 1) != '.' || src(pos + 2) != '.')
            fail("expected '...'")
          pos += 3
          if (peek() == '{') sels += RawInline(null, selectionSet(), Seq.empty)
          else if (peek() == '@') {
            val ds = directives()
            sels += RawInline(null, selectionSet(), ds)
          } else name() match {
            case "on" =>
              val cond = name()
              val ds = directives()
              sels += RawInline(cond, selectionSet(), ds)
            case frag => sels += RawSpread(frag, directives())
          }
        } else {
          val n1 = name()
          val (alias, n) =
            if (peek() == ':') { pos += 1; (n1, name()) } else (n1, n1)
          val args = arguments()
          val ds = directives()
          val sub = if (peek() == '{') selectionSet() else Seq.empty
          sels += RawField(alias, n, args, sub, ds)
        }
      }
      pos += 1
      sels.result()
    }

    /** The document: exactly one `query` operation (named or bare
      * selection set) plus any number of `fragment Name on Type`
      * definitions, in any order. */
    def document(): (Seq[RawSel], Map[String, (String, Seq[RawSel])]) = {
      var ops: Seq[RawSel] = null
      val frags = Map.newBuilder[String, (String, Seq[RawSel])]
      def operation(sels: Seq[RawSel]): Unit = {
        if (ops != null) fail("multiple operations in one document")
        ops = sels
      }
      skip()
      while (pos < src.length) {
        if (peek() == '{') operation(selectionSet())
        else name() match {
          case "query" =>
            if (peek() != '{' && peek() != '(') { name(); () } // operation name
            if (peek() == '(') { // variable DEFINITIONS: types only, skip to ')'
              pos += 1 // consume '('
              var depth = 0
              while (pos < src.length && (depth > 0 || src(pos) != ')')) {
                if (src(pos) == '(') depth += 1
                if (src(pos) == ')') depth -= 1
                pos += 1
              }
              expect(')')
            }
            operation(selectionSet())
          case "fragment" =>
            val fn = name()
            if (fn == "on") fail("fragment name may not be 'on'")
            if (name() != "on") fail("expected 'on' in the fragment definition")
            frags += fn -> (name(), selectionSet())
          case op =>
            fail(s"unsupported operation '$op' (the schema is query-only)")
        }
        skip()
      }
      if (ops == null) fail("no query operation in the document")
      (ops, frags.result())
    }
  }
}
