package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.api.{GraphQl, QueryService, RestServer}
import graft.fixtures.EvmFixtures
import graft.queries.EvmQueries

/** The /v1/graphql tier: the subset parser, resolver dispatch into
  * QueryService, data.go output shaping, gqlgen's error envelope, and
  * the POST route end-to-end over HTTP. */
class GraphQlSpec extends SparkSpec {

  private lazy val svc = new QueryService(
    EvmQueries.blocks(spark), EvmQueries.txs(spark), EvmQueries.events(spark))
  private lazy val gql = new GraphQl(svc)
  private val mapper = new ObjectMapper()

  private def run(query: String, variables: String = null): com.fasterxml.jackson.databind.JsonNode = {
    val body = new java.util.LinkedHashMap[String, Any]()
    body.put("query", query)
    if (variables != null) body.put("variables", mapper.readTree(variables))
    mapper.readTree(gql.execute(mapper.writeValueAsString(body)))
  }

  test("parser: operations, arguments, variables, ignorable tokens, errors") {
    val vars = new java.util.HashMap[String, Any]()
    vars.put("h", "0xabc")
    vars.put("ts", java.util.List.of("0x1", "0x2"))
    val fields = GraphQl.parse(
      """# a comment
        |query Blocks {
        |  blockByHash(hash: $h) { hash, number }
        |  eventsFromContractWithTopicsByNumberRange(
        |    contract: "0xc", from: "1", to: "2", topics: $ts) { origin }
        |}""".stripMargin, vars).toOption.get
    assert(fields.map(_.name) ===
      Seq("blockByHash", "eventsFromContractWithTopicsByNumberRange"))
    assert(fields.head.args("hash") === "0xabc")
    assert(fields.head.selections ===
      Seq(GraphQl.Leaf("hash", "hash"), GraphQl.Leaf("number", "number")))
    assert(fields(1).args("topics") === Seq("0x1", "0x2"))

    assert(GraphQl.parse("mutation { x }", vars).isLeft)
    assert(GraphQl.parse("{ blockByHash { a { b } } }", vars).isLeft) // nested
    assert(GraphQl.parse("{ f(x: $nope) }", vars).isLeft)            // undefined var
    assert(GraphQl.parse("{ f } trailing", vars).isLeft)
  }

  test("parser: aliases, fragment definitions/spreads, __typename, cycles") {
    val vars = new java.util.HashMap[String, Any]()
    // aliases at both levels; a fragment defined AFTER its use; inline
    // fragment; __typename — the stock-client document shapes gqlgen takes
    val fields = GraphQl.parse(
      """query Q {
        |  myBlock: blockByHash(hash: "0xabc") {
        |    id: hash
        |    ...BlockBits
        |    ... on Block { time }
        |    __typename
        |  }
        |}
        |fragment BlockBits on Block { number, gasUsed }""".stripMargin,
      vars).toOption.get
    assert(fields.map(_.alias) === Seq("myBlock"))
    assert(fields.head.name === "blockByHash")
    assert(fields.head.selections === Seq(
      GraphQl.Leaf("hash", "id"),
      GraphQl.Guarded("Block",
        Seq(GraphQl.Leaf("number", "number"), GraphQl.Leaf("gasUsed", "gasUsed"))),
      GraphQl.Guarded("Block", Seq(GraphQl.Leaf("time", "time"))),
      GraphQl.Leaf("__typename", "__typename")))

    // top-level fragment on Query splices more root fields
    val roots = GraphQl.parse(
      """fragment Roots on Query { __typename b: blockByNumber(number: "7") { hash } }
        |{ ...Roots }""".stripMargin, vars).toOption.get
    assert(roots.map(_.alias) === Seq("__typename", "b"))

    assert(GraphQl.parse("{ ...Nope }", vars).isLeft)                 // unknown fragment
    assert(GraphQl.parse(
      "fragment A on Block { ...A } { blockByHash { ...A } }", vars).isLeft) // cycle
    assert(GraphQl.parse(
      "fragment A on Wat { hash } { blockByHash { ...A } }", vars).isLeft)   // unknown type
  }

  test("blockByHash shapes per data.go:40-70 (decimal strings, Float size)") {
    val b = EvmFixtures.buildBlock(1500, EvmFixtures.txCount(1500L))
    val resp = run(s"""{ blockByHash(hash: "${b.hash}") {
      hash number time gasUsed size extraData parentHash } }""")
    val node = resp.get("data").get("blockByHash")
    assert(node.get("hash").asText() === b.hash)
    assert(node.get("number").asText() === "1500")      // String, not Int
    assert(node.get("time").asText() === b.time.toString)
    assert(node.get("gasUsed").asText() === b.gasused.toString)
    assert(node.get("size").isDouble && node.get("size").asDouble() === b.size)
    assert(node.get("extraData").asText() === "")       // 1500 % 5 == 0 → empty
    assert(node.get("parentHash").asText() === b.parenthash)
    // only the selected fields appear, in selection order
    assert(node.size() === 7)
  }

  test("transaction to XOR contract and counts (data.go:103-133)") {
    // (22 + 0) % 11 == 0 → txHash(22, 0) is a contract creation
    val creation = run(s"""{ transaction(hash: "${EvmFixtures.txHash(22, 0)}") {
      hash to contract state } }""").get("data").get("transaction")
    assert(creation.get("to").asText() === "")
    assert(creation.get("contract").asText() === EvmFixtures.createdAddr(22, 0))

    val count = run("""{ transactionCountByBlockNumber(number: "2003") }""")
    assert(count.get("data").get("transactionCountByBlockNumber").asInt() ===
      EvmFixtures.txCount(2003L))
  }

  test("two fields, variables, and topic filters in one operation") {
    val resp = run(
      """query Q($c: String!, $ts: [String!]!) {
        |  lastXEventsFromContract(contract: $c, x: 5) { origin index }
        |  eventsFromContractWithTopicsByNumberRange(
        |    contract: $c, from: "1000", to: "1099", topics: $ts) { topics }
        |}""".stripMargin,
      s"""{"c": "${EvmFixtures.contractAddr(7)}", "ts": ["${EvmFixtures.sig(2)}"]}""")
    val data = resp.get("data")
    assert(data != null && !data.isNull, s"unexpected error response: $resp")
    assert(data.get("lastXEventsFromContract").size() === 5)
    val evs = data.get("eventsFromContractWithTopicsByNumberRange")
    assert(evs.size() > 0)
    (0 until evs.size()).foreach { i =>
      assert(evs.get(i).get("topics").get(0).asText() === EvmFixtures.sig(2))
    }
  }

  test("@include/@skip directives gate fields and spreads (literal + variable)") {
    val b = EvmFixtures.buildBlock(1500, EvmFixtures.txCount(1500L))
    val resp = run(
      s"""query Q($$full: Boolean!) {
         |  blockByHash(hash: "${b.hash}") {
         |    hash
         |    number @include(if: $$full)
         |    time @skip(if: true)
         |    gasUsed @skip(if: false) @include(if: true)
         |    ...More @include(if: false)
         |  }
         |}
         |fragment More on Block { miner }""".stripMargin,
      """{"full": true}""")
    val node = resp.get("data").get("blockByHash")
    assert(node.get("hash").asText() === b.hash)
    assert(node.get("number").asText() === "1500") // include(if: true) kept
    assert(!node.has("time"), "skip(if: true) must drop the field")
    assert(node.has("gasUsed"), "skip=false AND include=true keeps")
    assert(!node.has("miner"), "spread gated by include(if: false)")
    assert(node.size() === 3)

    // error envelope: unknown directive, missing/non-boolean if
    assert(run("""{ blockByNumber(number: "7") { hash @nope } }""")
      .get("errors").get(0).get("message").asText().contains("unknown directive"))
    assert(run("""{ blockByNumber(number: "7") { hash @skip(of: true) } }""")
      .get("errors").get(0).get("message").asText().contains("Boolean 'if'"))
  }

  test("fragment + alias query resolves to the same values as the plain form") {
    val b = EvmFixtures.buildBlock(1500, EvmFixtures.txCount(1500L))
    val plain = run(s"""{ blockByHash(hash: "${b.hash}") { hash number gasUsed } }""")
      .get("data").get("blockByHash")
    val fancy = run(
      s"""query Q {
         |  blk: blockByHash(hash: "${b.hash}") { h: hash ...Bits __typename }
         |}
         |fragment Bits on Block { number gasUsed }""".stripMargin)
      .get("data").get("blk")
    assert(fancy.get("h").asText() === plain.get("hash").asText())
    assert(fancy.get("number").asText() === plain.get("number").asText())
    assert(fancy.get("gasUsed").asText() === plain.get("gasUsed").asText())
    assert(fancy.get("__typename").asText() === "Block")
    assert(fancy.size() === 4)

    // __typename on a list entity and at the query root
    val evs = run(s"""{ __typename lastXEventsFromContract(
      contract: "${EvmFixtures.contractAddr(7)}", x: 2) { __typename origin } }""")
    assert(evs.get("data").get("__typename").asText() === "Query")
    assert(evs.get("data").get("lastXEventsFromContract").get(0)
      .get("__typename").asText() === "Event")
  }

  test("errors: Found nothing, guardrails, unknown fields (gqlgen envelope)") {
    val missing = run(s"""{ blockByHash(hash: "0x${"9" * 64}") { hash } }""")
    assert(missing.get("data").isNull)
    assert(missing.get("errors").get(0).get("message").asText() === "Found nothing")
    assert(missing.get("errors").get(0).get("path").get(0).asText() === "blockByHash")

    val tooWide = run("""{ blocksByNumberRange(from: "0", to: "500") { hash } }""")
    assert(tooWide.get("errors").get(0).get("message").asText().contains("width cap"))

    assert(run("{ nope }").get("errors").get(0).get("message").asText()
      .contains("unknown field"))
    // an out-of-Long integer literal is a syntax error in the envelope,
    // never an exception escaping the route
    assert(run("""{ lastXEventsFromContract(contract: "0xc", x: 99999999999999999999999) { origin } }""")
      .get("errors").get(0).get("message").asText().contains("bad integer literal"))
    assert(run("""{ blockByNumber(number: "13") { hash } }""")
      .get("errors").get(0).get("message").asText() === "Found nothing")
  }

  test("the POST /v1/graphql route serves the same envelope over HTTP") {
    val server = new RestServer(svc,
      () => RestServer.SyncStatus(0, 0, 0, 0.0, "idle"))
    server.start()
    try {
      val body = mapper.writeValueAsString(java.util.Map.of(
        "query", s"""{ blockByHash(hash: "${EvmFixtures.blockHash(1500)}") { hash number } }"""))
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.boundPort}/v1/graphql"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      val node = mapper.readTree(resp.body()).get("data").get("blockByHash")
      assert(node.get("hash").asText() === EvmFixtures.blockHash(1500))
      assert(node.get("number").asText() === "1500")

      // the playground route (rest.go:887-900) serves an HTML console
      val play = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${server.boundPort}/v1/graphql-playground")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(play.statusCode() === 200 && play.body().contains("/v1/graphql"))

      // gin routes are exact (rest.go:887-900): prefix-matched suffixes 404
      def status(path: String): Int = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${server.boundPort}$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode()
      assert(status("/v1/graphql-playground/anything") === 404)
      assert(status("/v1/graphql-playgroundzzz") === 404)
      assert(status("/v1/graphqlzzz") === 404)
    } finally server.stop()
  }

  test("introspection: __schema surfaces the full gqlgen schema shape") {
    val r = run(
      """{ __schema {
        |  queryType { name kind }
        |  mutationType { name }
        |  types { name kind }
        |  directives { name locations args { name type { kind ofType { name } } } }
        |} }""".stripMargin).get("data").get("__schema")
    assert(r.get("queryType").get("name").asText() === "Query")
    assert(r.get("queryType").get("kind").asText() === "OBJECT")
    assert(r.get("mutationType").isNull, "schema has no mutations")
    val typeNames = (0 until r.get("types").size())
      .map(i => r.get("types").get(i).get("name").asText()).toSet
    for (t <- Seq("Query", "Block", "Transaction", "Event", "String", "Int",
        "Float", "Boolean", "__Schema", "__Type", "__Field", "__TypeKind"))
      assert(typeNames.contains(t), s"missing type $t")
    val dirs = (0 until r.get("directives").size())
      .map(i => r.get("directives").get(i))
    assert(dirs.map(_.get("name").asText()).toSet
      .intersect(Set("include", "skip")) === Set("include", "skip"))
    val include = dirs.find(_.get("name").asText() == "include").get
    assert(include.get("locations").get(0).asText() === "FIELD")
    val ifArg = include.get("args").get(0)
    assert(ifArg.get("name").asText() === "if")
    assert(ifArg.get("type").get("kind").asText() === "NON_NULL")
    assert(ifArg.get("type").get("ofType").get("name").asText() === "Boolean")
  }

  test("introspection: __type walks fields, args, and wrapped type chains") {
    // Query has exactly the reference schema's 33 root fields
    val q = run("""{ __type(name: "Query") { fields { name } } }""")
      .get("data").get("__type")
    val rootFields = (0 until q.get("fields").size())
      .map(i => q.get("fields").get(i).get("name").asText())
    assert(rootFields.size === 33, s"got ${rootFields.size}: $rootFields")
    assert(rootFields.contains("blockByHash"))
    assert(rootFields.contains("eventsFromContractWithTopicsByNumberRange"))

    // Block: 15 fields, size is Float!, the rest String!
    val b = run(
      """{ __type(name: "Block") {
        |  kind fields { name type { kind ofType { kind name } } } } }""".stripMargin)
      .get("data").get("__type")
    assert(b.get("kind").asText() === "OBJECT")
    assert(b.get("fields").size() === 15)
    val size = (0 until 15).map(b.get("fields").get)
      .find(_.get("name").asText() == "size").get
    assert(size.get("type").get("kind").asText() === "NON_NULL")
    assert(size.get("type").get("ofType").get("name").asText() === "Float")

    // Event.topics: NON_NULL → LIST → NON_NULL → String
    val e = run(
      """{ __type(name: "Event") { fields {
        |  name type { kind ofType { kind ofType { kind ofType { name } } } } } } }"""
        .stripMargin).get("data").get("__type")
    val topics = (0 until e.get("fields").size()).map(e.get("fields").get)
      .find(_.get("name").asText() == "topics").get.get("type")
    assert(topics.get("kind").asText() === "NON_NULL")
    assert(topics.get("ofType").get("kind").asText() === "LIST")
    assert(topics.get("ofType").get("ofType").get("kind").asText() === "NON_NULL")
    assert(topics.get("ofType").get("ofType").get("ofType").get("name").asText() === "String")

    // lastXEventsFromContract(x:) is the schema's one Int! argument
    val args = run(
      """{ __type(name: "Query") { fields {
        |  name args { name type { ofType { name } } } } } }""".stripMargin)
      .get("data").get("__type")
    val lastX = (0 until args.get("fields").size()).map(args.get("fields").get)
      .find(_.get("name").asText() == "lastXEventsFromContract").get
    val xArg = (0 until lastX.get("args").size()).map(lastX.get("args").get)
      .find(_.get("name").asText() == "x").get
    assert(xArg.get("type").get("ofType").get("name").asText() === "Int")

    // unknown type name → null data, not an error (spec §4.5.2)
    val unknown = run("""{ __type(name: "Nope") { name } }""")
    assert(unknown.get("data").get("__type").isNull)
    assert(!unknown.has("errors"))
  }

  test("introspection: GraphiQL's stock IntrospectionQuery document executes") {
    // the fragment-structured document every GraphiQL/codegen client
    // sends on connect (depth-7 TypeRef chain, fragments on meta types)
    val r = run(
      """query IntrospectionQuery {
        |  __schema {
        |    queryType { name }
        |    mutationType { name }
        |    subscriptionType { name }
        |    types { ...FullType }
        |    directives { name locations args { ...InputValue } }
        |  }
        |}
        |fragment FullType on __Type {
        |  kind name
        |  fields(includeDeprecated: true) {
        |    name args { ...InputValue }
        |    type { ...TypeRef }
        |    isDeprecated deprecationReason
        |  }
        |  inputFields { ...InputValue }
        |  interfaces { ...TypeRef }
        |  enumValues(includeDeprecated: true) { name isDeprecated deprecationReason }
        |  possibleTypes { ...TypeRef }
        |}
        |fragment InputValue on __InputValue {
        |  name type { ...TypeRef } defaultValue
        |}
        |fragment TypeRef on __Type {
        |  kind name
        |  ofType { kind name ofType { kind name ofType { kind name
        |    ofType { kind name ofType { kind name ofType { kind name
        |      ofType { kind name } } } } } } }
        |}""".stripMargin)
    assert(!r.has("errors"), s"stock introspection failed: ${r.get("errors")}")
    val schema = r.get("data").get("__schema")
    assert(schema.get("queryType").get("name").asText() === "Query")
    // every OBJECT type resolves its field list; ENUMs their values
    val types = schema.get("types")
    val kinds = (0 until types.size()).map(types.get)
    assert(kinds.exists(t => t.get("kind").asText() == "ENUM" &&
      t.get("enumValues").size() >= 8))
    val query = kinds.find(_.get("name").asText() == "Query").get
    assert(query.get("fields").size() === 33)
    assert(query.get("interfaces").size() === 0)
    assert(query.get("inputFields").isNull)
  }
}
