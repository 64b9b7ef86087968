package graft.api

/** GraphQL introspection (`__schema` / `__type`) over the reference's
  * schema — what lets GraphiQL and typed clients self-configure against
  * the endpoint, exactly as gqlgen serves it for
  * `app/rest/graph/schema.graphqls` (generated resolvers in
  * `app/rest/graph/generated/generated.go`).
  *
  * The schema is declared as data (a transcription of
  * `schema.graphqls`: Block/Transaction/Event/Query plus the standard
  * scalars, meta types, and directives), and a small recursive shaper
  * walks the client's nested selection tree ([[GraphQl.ISel]]) over it.
  * Spec reference: GraphQL October 2021, §4 (Introspection).
  */
object GraphQlIntrospection {
  import GraphQl.{IField, IGuard, ISel}

  // ---- schema model -----------------------------------------------------

  /** A type reference: either a named type (`of == null`) or a
    * NON_NULL/LIST wrapper around `of`. `kind` is the __TypeKind. */
  final case class Ref(kind: String, name: String, of: Ref)

  final case class Arg(name: String, tpe: Ref, defaultValue: String = null)
  final case class Fld(name: String, args: Seq[Arg], tpe: Ref)
  final case class EnumVal(name: String)
  final case class Directive(name: String, description: String,
    locations: Seq[String], args: Seq[Arg])
  final case class TypeDef(kind: String, name: String, description: String,
    fields: Seq[Fld] = Nil, enumValues: Seq[EnumVal] = Nil)

  private def named(d: TypeDef): Ref = Ref(d.kind, d.name, null)
  private def nn(r: Ref): Ref = Ref("NON_NULL", null, r)
  private def list(r: Ref): Ref = Ref("LIST", null, r)

  private val scalarDefs = Seq("String", "Int", "Float", "Boolean", "ID")
    .map(n => TypeDef("SCALAR", n, s"The built-in `$n` scalar"))
  private def sc(n: String): Ref = Ref("SCALAR", n, null)
  private val S = nn(sc("String"))
  private val I = nn(sc("Int"))
  private val F = nn(sc("Float"))
  private val SL = nn(list(S)) // [String!]!

  private def f(name: String, tpe: Ref, args: (String, Ref)*): Fld =
    Fld(name, args.map { case (an, at) => Arg(an, at) }, tpe)

  private val blockDef = TypeDef("OBJECT", "Block", "A mined block", Seq(
    f("hash", S), f("number", S), f("time", S), f("parentHash", S),
    f("difficulty", S), f("gasUsed", S), f("gasLimit", S), f("nonce", S),
    f("miner", S), f("size", F), f("stateRootHash", S), f("uncleHash", S),
    f("txRootHash", S), f("receiptRootHash", S), f("extraData", S)))

  private val txDef = TypeDef("OBJECT", "Transaction", "A transaction", Seq(
    "hash", "from", "to", "contract", "value", "data", "gas", "gasPrice",
    "cost", "nonce", "state", "blockHash").map(n => f(n, S)))

  private val eventDef = TypeDef("OBJECT", "Event", "An emitted log event", Seq(
    f("origin", S), f("index", S), f("topics", SL), f("data", S),
    f("txHash", S), f("blockHash", S)))

  private val B = nn(named(blockDef))
  private val BL = nn(list(B))
  private val T = nn(named(txDef))
  private val TL = nn(list(T))
  private val E = nn(named(eventDef))
  private val EL = nn(list(E))

  private def rangeArgs(first: (String, Ref)*): Seq[(String, Ref)] =
    first ++ Seq("from" -> S, "to" -> S)

  private val queryDef = TypeDef("OBJECT", "Query", "The root query type", Seq(
    f("blockByHash", B, "hash" -> S),
    f("blockByNumber", B, "number" -> S),
    f("blocksByNumberRange", BL, rangeArgs(): _*),
    f("blocksByTimeRange", BL, rangeArgs(): _*),
    f("transaction", T, "hash" -> S),
    f("transactionCountByBlockHash", I, "hash" -> S),
    f("transactionsByBlockHash", TL, "hash" -> S),
    f("transactionCountByBlockNumber", I, "number" -> S),
    f("transactionsByBlockNumber", TL, "number" -> S),
    f("transactionCountFromAccountByNumberRange", I, rangeArgs("account" -> S): _*),
    f("transactionsFromAccountByNumberRange", TL, rangeArgs("account" -> S): _*),
    f("transactionCountFromAccountByTimeRange", I, rangeArgs("account" -> S): _*),
    f("transactionsFromAccountByTimeRange", TL, rangeArgs("account" -> S): _*),
    f("transactionCountToAccountByNumberRange", I, rangeArgs("account" -> S): _*),
    f("transactionsToAccountByNumberRange", TL, rangeArgs("account" -> S): _*),
    f("transactionCountToAccountByTimeRange", I, rangeArgs("account" -> S): _*),
    f("transactionsToAccountByTimeRange", TL, rangeArgs("account" -> S): _*),
    f("transactionCountBetweenAccountsByNumberRange", I,
      rangeArgs("fromAccount" -> S, "toAccount" -> S): _*),
    f("transactionsBetweenAccountsByNumberRange", TL,
      rangeArgs("fromAccount" -> S, "toAccount" -> S): _*),
    f("transactionCountBetweenAccountsByTimeRange", I,
      rangeArgs("fromAccount" -> S, "toAccount" -> S): _*),
    f("transactionsBetweenAccountsByTimeRange", TL,
      rangeArgs("fromAccount" -> S, "toAccount" -> S): _*),
    f("contractsCreatedFromAccountByNumberRange", TL, rangeArgs("account" -> S): _*),
    f("contractsCreatedFromAccountByTimeRange", TL, rangeArgs("account" -> S): _*),
    f("transactionFromAccountWithNonce", T, "account" -> S, "nonce" -> S),
    f("eventsFromContractByNumberRange", EL, rangeArgs("contract" -> S): _*),
    f("eventsFromContractByTimeRange", EL, rangeArgs("contract" -> S): _*),
    f("eventsByBlockHash", EL, "hash" -> S),
    f("eventsByTxHash", EL, "hash" -> S),
    f("eventsFromContractWithTopicsByNumberRange", EL,
      rangeArgs("contract" -> S) :+ ("topics" -> SL): _*),
    f("eventsFromContractWithTopicsByTimeRange", EL,
      rangeArgs("contract" -> S) :+ ("topics" -> SL): _*),
    f("lastXEventsFromContract", EL, "contract" -> S, "x" -> I),
    f("eventByBlockHashAndLogIndex", E, "hash" -> S, "index" -> S),
    f("eventByBlockNumberAndLogIndex", E, "number" -> S, "index" -> S)))

  // ---- meta types (spec §4.5) -------------------------------------------

  private def TT = Ref("OBJECT", "__Type", null)
  private val includeDeprecated = Arg("includeDeprecated", sc("Boolean"), "false")

  private val metaDefs = Seq(
    TypeDef("OBJECT", "__Schema", "A GraphQL schema", Seq(
      f("description", sc("String")),
      f("types", nn(list(nn(TT)))),
      f("queryType", nn(TT)),
      f("mutationType", TT),
      f("subscriptionType", TT),
      f("directives", nn(list(nn(Ref("OBJECT", "__Directive", null))))))),
    TypeDef("OBJECT", "__Type", "A type in the schema", Seq(
      f("kind", nn(Ref("ENUM", "__TypeKind", null))),
      f("name", sc("String")),
      f("description", sc("String")),
      Fld("fields", Seq(includeDeprecated), list(nn(Ref("OBJECT", "__Field", null)))),
      f("interfaces", list(nn(TT))),
      f("possibleTypes", list(nn(TT))),
      Fld("enumValues", Seq(includeDeprecated),
        list(nn(Ref("OBJECT", "__EnumValue", null)))),
      f("inputFields", list(nn(Ref("OBJECT", "__InputValue", null)))),
      f("ofType", TT),
      f("specifiedByURL", sc("String")))),
    TypeDef("OBJECT", "__Field", "A field on an object type", Seq(
      f("name", S), f("description", sc("String")),
      f("args", nn(list(nn(Ref("OBJECT", "__InputValue", null))))),
      f("type", nn(TT)),
      f("isDeprecated", nn(sc("Boolean"))),
      f("deprecationReason", sc("String")))),
    TypeDef("OBJECT", "__InputValue", "An argument or input field", Seq(
      f("name", S), f("description", sc("String")),
      f("type", nn(TT)), f("defaultValue", sc("String")))),
    TypeDef("OBJECT", "__EnumValue", "A possible enum value", Seq(
      f("name", S), f("description", sc("String")),
      f("isDeprecated", nn(sc("Boolean"))),
      f("deprecationReason", sc("String")))),
    TypeDef("OBJECT", "__Directive", "A directive", Seq(
      f("name", S), f("description", sc("String")),
      f("locations", nn(list(nn(Ref("ENUM", "__DirectiveLocation", null))))),
      f("args", nn(list(nn(Ref("OBJECT", "__InputValue", null))))),
      f("isRepeatable", nn(sc("Boolean"))))),
    TypeDef("ENUM", "__TypeKind", "The kind of a type",
      enumValues = Seq("SCALAR", "OBJECT", "INTERFACE", "UNION", "ENUM",
        "INPUT_OBJECT", "LIST", "NON_NULL").map(EnumVal)),
    TypeDef("ENUM", "__DirectiveLocation", "A place a directive may appear",
      enumValues = Seq("QUERY", "MUTATION", "SUBSCRIPTION", "FIELD",
        "FRAGMENT_DEFINITION", "FRAGMENT_SPREAD", "INLINE_FRAGMENT",
        "VARIABLE_DEFINITION", "SCHEMA", "SCALAR", "OBJECT",
        "FIELD_DEFINITION", "ARGUMENT_DEFINITION", "INTERFACE", "UNION",
        "ENUM", "ENUM_VALUE", "INPUT_OBJECT",
        "INPUT_FIELD_DEFINITION").map(EnumVal)))

  private val allDefs: Seq[TypeDef] =
    Seq(queryDef, blockDef, txDef, eventDef) ++ scalarDefs ++ metaDefs

  private val byName: Map[String, TypeDef] = allDefs.map(d => d.name -> d).toMap

  private val directives = Seq(
    Directive("include",
      "Include this field or fragment only when the `if` argument is true",
      Seq("FIELD", "FRAGMENT_SPREAD", "INLINE_FRAGMENT"),
      Seq(Arg("if", nn(sc("Boolean"))))),
    Directive("skip",
      "Skip this field or fragment when the `if` argument is true",
      Seq("FIELD", "FRAGMENT_SPREAD", "INLINE_FRAGMENT"),
      Seq(Arg("if", nn(sc("Boolean"))))),
    Directive("deprecated",
      "Marks an element of a GraphQL schema as no longer supported",
      Seq("FIELD_DEFINITION", "ARGUMENT_DEFINITION",
        "INPUT_FIELD_DEFINITION", "ENUM_VALUE"),
      Seq(Arg("reason", sc("String"), "\"No longer supported\""))),
    Directive("specifiedBy",
      "Exposes a URL that specifies the behavior of this scalar",
      Seq("SCALAR"),
      Seq(Arg("url", nn(sc("String"))))))

  // ---- shaping ----------------------------------------------------------

  private case object SchemaObj

  /** `{ __schema { … } }` */
  def schema(sels: Seq[ISel]): Either[String, Any] = shape(SchemaObj, sels)

  /** `{ __type(name: "X") { … } }` — null data for an unknown name. */
  def typeByName(args: Map[String, Any], sels: Seq[ISel]): Either[String, Any] =
    args.get("name") match {
      case Some(n: String) =>
        byName.get(n) match {
          case Some(d) => shape(named(d), sels)
          case None => Right(null)
        }
      case _ => Left("__type requires a String 'name' argument")
    }

  /** The concrete meta type of a runtime object, for __typename and
    * fragment guards. */
  private def typename(obj: Any): String = obj match {
    case SchemaObj => "__Schema"
    case _: Ref => "__Type"
    case _: Fld => "__Field"
    case _: Arg => "__InputValue"
    case _: EnumVal => "__EnumValue"
    case _: Directive => "__Directive"
    case other => throw new IllegalStateException(s"not a meta object: $other")
  }

  private def shape(value: Any, sels: Seq[ISel]): Either[String, Any] = value match {
    case null => Right(null)
    case s: String => leaf(s, sels)
    case b: java.lang.Boolean => leaf(b, sels)
    case xs: Seq[_] =>
      val out = new java.util.ArrayList[Any](xs.size)
      for (x <- xs) shape(x, sels) match {
        case Left(m) => return Left(m)
        case Right(v) => out.add(v)
      }
      Right(out)
    case obj =>
      if (sels.isEmpty) Left(s"${typename(obj)} requires a selection set")
      else {
        val out = new java.util.LinkedHashMap[String, Any]()
        def fold(ss: Seq[ISel]): Option[String] = {
          for (sel <- ss) sel match {
            case IField("__typename", alias, _, _) => out.put(alias, typename(obj))
            case IField(n, alias, args, sub) =>
              fieldOf(obj, n, args) match {
                case Left(m) => return Some(m)
                case Right(v) => shape(v, sub) match {
                  case Left(m) => return Some(m)
                  case Right(sv) => out.put(alias, sv)
                }
              }
            case IGuard(cond, sub) =>
              if (cond == "*" || cond == typename(obj))
                fold(sub).foreach(m => return Some(m))
          }
          None
        }
        fold(sels) match {
          case Some(m) => Left(m)
          case None => Right(out)
        }
      }
  }

  private def leaf(v: Any, sels: Seq[ISel]): Either[String, Any] =
    if (sels.isEmpty) Right(v)
    else Left("scalar introspection fields take no selection set")

  private def fieldOf(obj: Any, name: String,
      args: Map[String, Any]): Either[String, Any] = (obj, name) match {
    case (SchemaObj, "description") => Right(null)
    case (SchemaObj, "types") => Right(allDefs.map(named))
    case (SchemaObj, "queryType") => Right(named(queryDef))
    case (SchemaObj, "mutationType") => Right(null)
    case (SchemaObj, "subscriptionType") => Right(null)
    case (SchemaObj, "directives") => Right(directives)

    case (r: Ref, "kind") => Right(r.kind)
    case (r: Ref, "name") => Right(r.name)
    case (r: Ref, "description") =>
      Right(if (r.name == null) null else byName.get(r.name).map(_.description).orNull)
    case (r: Ref, "fields") =>
      // includeDeprecated is accepted but moot: nothing is deprecated
      Right(defOf(r).filter(_.kind == "OBJECT").map(_.fields).orNull)
    case (r: Ref, "interfaces") =>
      Right(defOf(r).filter(_.kind == "OBJECT").map(_ => Seq.empty[Ref]).orNull)
    case (r: Ref, "possibleTypes") => Right(null)
    case (r: Ref, "enumValues") =>
      Right(defOf(r).filter(_.kind == "ENUM").map(_.enumValues).orNull)
    case (r: Ref, "inputFields") => Right(null)
    case (r: Ref, "ofType") => Right(r.of)
    case (r: Ref, "specifiedByURL" | "specifiedByUrl") => Right(null)

    case (fd: Fld, "name") => Right(fd.name)
    case (fd: Fld, "description") => Right(null)
    case (fd: Fld, "args") => Right(fd.args)
    case (fd: Fld, "type") => Right(fd.tpe)
    case (fd: Fld, "isDeprecated") => Right(java.lang.Boolean.FALSE)
    case (fd: Fld, "deprecationReason") => Right(null)

    case (a: Arg, "name") => Right(a.name)
    case (a: Arg, "description") => Right(null)
    case (a: Arg, "type") => Right(a.tpe)
    case (a: Arg, "defaultValue") => Right(a.defaultValue)

    case (e: EnumVal, "name") => Right(e.name)
    case (e: EnumVal, "description") => Right(null)
    case (e: EnumVal, "isDeprecated") => Right(java.lang.Boolean.FALSE)
    case (e: EnumVal, "deprecationReason") => Right(null)

    case (d: Directive, "name") => Right(d.name)
    case (d: Directive, "description") => Right(d.description)
    // enum VALUES serialize as leaf strings (only __Type.enumValues
    // exposes them as __EnumValue objects)
    case (d: Directive, "locations") => Right(d.locations)
    case (d: Directive, "args") => Right(d.args)
    case (d: Directive, "isRepeatable") => Right(java.lang.Boolean.FALSE)

    case (o, other) => Left(s"unknown field $other on ${typename(o)}")
  }

  /** The named def behind a ref, if it is a named (non-wrapper) ref. */
  private def defOf(r: Ref): Option[TypeDef] =
    if (r.name == null) None else byName.get(r.name)
}
