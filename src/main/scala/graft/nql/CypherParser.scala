package graft.nql

import scala.util.matching.Regex

/** Cypher-subset MATCH (reference executor scope
  * `query_router/src/cypher.rs:47-500`: one pattern chain, optional
  * labels/property maps, bounded variable-length hops, WHERE on
  * `var.col`, RETURN projection, ORDER BY / LIMIT). Parity-plus beyond
  * the reference executor: comma-separated multi-pattern MATCH (shared
  * variables join, disjoint chains are a cartesian product) and
  * `SET var.prop = '…'` property updates.
  *
  *   MATCH (a:nation {name: 'CHINA'})-[:same_region*1..2]-(b:nation)
  *   WHERE b.key <> 'nation:0' RETURN b.name ORDER BY b.name LIMIT 10
  *
  *   MATCH (c:customer)-[:in_nation]->(n:nation), (n)-[:in_region]->(r:region)
  *   RETURN c.key, r.name
  */
object CypherParser {

  final case class NodePat(variable: String, label: Option[String], props: Map[String, String])
  final case class EdgePat(etype: Option[String], minHops: Int, maxHops: Int, direction: Int) // 1 = ->, -1 = <-, 0 = undirected
  final case class MatchStmt(
      nodes: Seq[NodePat], edges: Seq[EdgePat],
      where: Seq[Cond], returns: Seq[String],
      orderBy: Seq[(String, Boolean)], limit: Option[Int],
      optNodes: Seq[NodePat] = Nil, optEdges: Seq[EdgePat] = Nil,
      skip: Option[Int] = None, delete: Option[String] = None,
      morePatterns: Seq[(Seq[NodePat], Seq[EdgePat])] = Nil,
      set: Seq[(String, String, String)] = Nil) extends Statement

  /** CREATE / MERGE of a single node pattern; the `key` property is the
    * entity identity (MERGE = create only if the key is absent). */
  final case class CypherCreate(node: NodePat, merge: Boolean) extends Statement

  /** CREATE of a relationship pattern `(a)-[:T]->(b)`: endpoints are
    * created/merged if they carry a label or extra props, then connected. */
  final case class CypherCreateRel(from: NodePat, etype: String, to: NodePat,
      merge: Boolean) extends Statement

  private val tokenRe: Regex =
    """\s*(?:('(?:[^'\\]|\\.)*')|(\d+)|([A-Za-z_][A-Za-z0-9_.]*)|(<=|>=|<>|!=|\.\.|->|<-|-|=|<|>|\*|,|\(|\)|\[|\]|\{|\}|:))""".r

  private def tokenize(q: String): Vector[String] = {
    var rest = q.trim
    val out = Vector.newBuilder[String]
    while (rest.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) => out += m.group(0).trim; rest = rest.substring(m.end)
        case None => throw NqlParseException(s"cypher: cannot tokenize at: ${rest.take(30)}")
      }
    }
    out.result()
  }

  private final class P(ts: Vector[String]) {
    var i = 0
    def peek: Option[String] = if (i < ts.length) Some(ts(i)) else None
    def peekAt(k: Int): Option[String] = if (i + k < ts.length) Some(ts(i + k)) else None
    def next(): String = {
      if (i >= ts.length) throw NqlParseException("cypher: unexpected end of input")
      val t = ts(i); i += 1; t
    }
    def expect(t: String): Unit = { val g = next(); if (g != t && g.toUpperCase != t) throw NqlParseException(s"cypher: expected $t, got $g") }
    def accept(t: String): Boolean = if (peek.exists(x => x == t || x.toUpperCase == t)) { i += 1; true } else false
    def stringLit(): String = {
      val t = next()
      if (!t.startsWith("'")) throw NqlParseException(s"cypher: expected string, got $t")
      t.substring(1, t.length - 1).replace("\\'", "'")
    }
    def done: Boolean = i >= ts.length
  }

  def parse(query: String): MatchStmt = {
    val p = new P(tokenize(query.trim.stripSuffix(";")))
    p.expect("MATCH")
    val nodes = Seq.newBuilder[NodePat]
    val edges = Seq.newBuilder[EdgePat]
    nodes += parseNode(p)
    while (p.peek.exists(t => t == "-" || t == "<-")) {
      edges += parseEdge(p)
      nodes += parseNode(p)
    }
    // comma-separated additional pattern chains (Cypher multi-pattern
    // MATCH): `MATCH (a)-[..]->(b), (b)-[..]->(c)`. A comma is a pattern
    // separator only when followed by `(` — RETURN/SET lists reuse it.
    val more = Seq.newBuilder[(Seq[NodePat], Seq[EdgePat])]
    while (p.peek.contains(",") && p.peekAt(1).contains("(")) {
      p.next()
      val ns = Seq.newBuilder[NodePat]
      val es = Seq.newBuilder[EdgePat]
      ns += parseNode(p)
      while (p.peek.exists(t => t == "-" || t == "<-")) {
        es += parseEdge(p)
        ns += parseNode(p)
      }
      more += ((ns.result(), es.result()))
    }
    val allChainVars =
      (nodes.result().map(_.variable) ++
        more.result().flatMap(_._1.map(_.variable))).toSet
    val optNodes = Seq.newBuilder[NodePat]
    val optEdges = Seq.newBuilder[EdgePat]
    if (p.accept("OPTIONAL")) {
      p.expect("MATCH")
      val boundVars = allChainVars
      val anchor = parseNode(p)
      if (!boundVars.contains(anchor.variable))
        throw NqlParseException(
          s"cypher: OPTIONAL MATCH must start from a bound variable (got ${anchor.variable})")
      optNodes += anchor
      while (p.peek.exists(t => t == "-" || t == "<-")) {
        optEdges += parseEdge(p)
        val n = parseNode(p)
        if (boundVars.contains(n.variable))
          throw NqlParseException(s"cypher: OPTIONAL MATCH re-binds ${n.variable}")
        optNodes += n
      }
      if (optEdges.result().isEmpty)
        throw NqlParseException("cypher: OPTIONAL MATCH needs at least one edge")
    }
    val where =
      if (p.accept("WHERE")) parseConds(p) else Nil
    if (p.accept("DELETE")) {
      val v = p.next()
      if (!allChainVars.contains(v))
        throw NqlParseException(s"cypher: DELETE of unbound variable $v")
      if (!p.done) throw NqlParseException("cypher: DELETE takes a single variable")
      return MatchStmt(nodes.result(), edges.result(), where, Nil, Nil, None,
        optNodes.result(), optEdges.result(), None, Some(v), more.result())
    }
    if (p.accept("SET")) {
      // `SET v.prop = 'value' [, v2.prop2 = '…']` — a write statement
      // (reference executor has no SET; parity-plus per SURVEY §2.10).
      val sets = Seq.newBuilder[(String, String, String)]
      var go = true
      while (go) {
        val target = p.next()
        val dot = target.indexOf('.')
        if (dot <= 0 || dot == target.length - 1)
          throw NqlParseException(s"cypher: SET target must be var.prop (got $target)")
        val (v, prop) = (target.substring(0, dot), target.substring(dot + 1))
        if (!allChainVars.contains(v))
          throw NqlParseException(s"cypher: SET on unbound variable $v")
        if (prop == "key")
          throw NqlParseException("cypher: SET cannot reassign the entity key")
        p.expect("=")
        val value = p.stringLit()
        sets += ((v, prop, value))
        go = p.accept(",")
      }
      if (!p.done) throw NqlParseException("cypher: SET must end the statement")
      return MatchStmt(nodes.result(), edges.result(), where, Nil, Nil, None,
        optNodes.result(), optEdges.result(), None, None, more.result(), sets.result())
    }
    p.expect("RETURN")
    val rets = Seq.newBuilder[String]
    rets += p.next()
    while (p.accept(",")) rets += p.next()
    val order = Seq.newBuilder[(String, Boolean)]
    if (p.accept("ORDER")) {
      p.expect("BY")
      var go = true
      while (go) {
        val c = p.next()
        val asc = if (p.accept("DESC")) false else { p.accept("ASC"); true }
        order += ((c, asc))
        go = p.accept(",")
      }
    }
    val skip = if (p.accept("SKIP")) Some(p.next().toInt) else None
    val limit = if (p.accept("LIMIT")) Some(p.next().toInt) else None
    if (!p.done) throw NqlParseException(s"cypher: trailing tokens at ${p.peek.get}")
    MatchStmt(nodes.result(), edges.result(), where, rets.result(), order.result(), limit,
      optNodes.result(), optEdges.result(), skip, None, more.result())
  }

  /** Pattern-only entry for GRAPH MATCH COUNT/EXISTS: a node-edge chain
    * plus optional WHERE, with no RETURN clause (the statement form
    * aggregates, it does not project). */
  def parsePattern(query: String): MatchStmt = {
    val p = new P(tokenize(query.trim.stripSuffix(";")))
    val nodes = Seq.newBuilder[NodePat]
    val edges = Seq.newBuilder[EdgePat]
    nodes += parseNode(p)
    while (p.peek.exists(t => t == "-" || t == "<-")) {
      edges += parseEdge(p)
      nodes += parseNode(p)
    }
    val where = if (p.accept("WHERE")) parseConds(p) else Nil
    if (!p.done) throw NqlParseException(s"cypher: trailing tokens at ${p.peek.get}")
    MatchStmt(nodes.result(), edges.result(), where, Nil, Nil, None)
  }

  /** `CREATE (n:label {key: '…', …})`, `MERGE (…)`, or a relationship
    * `CREATE (a {key:…})-[:T]->(b {key:…})`. */
  def parseWrite(query: String, merge: Boolean): Statement = {
    val p = new P(tokenize(query.trim.stripSuffix(";")))
    p.next() // CREATE | MERGE
    // entity identity: 'key' property, falling back to 'name' (same
    // string-keyed-store adaptation as NODE CREATE — the reference's
    // own test statements write `MERGE (n:person {name: 'Charlie'})`)
    def keyed(n: NodePat, what: String): NodePat =
      if (n.props.contains("key")) n
      else n.props.get("name") match {
        case Some(nm) => n.copy(props = n.props + ("key" -> nm))
        case None => throw NqlParseException(
          s"cypher: CREATE/MERGE needs a 'key' (or 'name') property$what")
      }
    val node = keyed(parseNode(p), " (the entity identity)")
    if (p.done) return CypherCreate(node, merge)
    val edge = parseEdge(p)
    val to = keyed(parseNode(p), " on both endpoints")
    if (!p.done) throw NqlParseException("cypher: CREATE takes one node or one relationship pattern")
    if (edge.minHops != 1 || edge.maxHops != 1)
      throw NqlParseException("cypher: relationship CREATE cannot be variable-length")
    if (edge.direction == 0)
      throw NqlParseException("cypher: relationship CREATE needs a direction (-> or <-)")
    val etype = edge.etype.getOrElse(
      throw NqlParseException("cypher: relationship CREATE needs an edge type"))
    if (edge.direction == 1) CypherCreateRel(node, etype, to, merge)
    else CypherCreateRel(to, etype, node, merge)
  }

  private def parseNode(p: P): NodePat = {
    p.expect("(")
    val variable = p.next()
    val label = if (p.accept(":")) Some(p.next()) else None
    var props = Map.empty[String, String]
    if (p.accept("{")) {
      var go = true
      while (go) {
        val k = p.next(); p.expect(":"); val v = p.stringLit()
        props += (k -> v)
        go = p.accept(",")
      }
      p.expect("}")
    }
    p.expect(")")
    NodePat(variable, label, props)
  }

  private def parseEdge(p: P): EdgePat = {
    // forms: -[:T]->  <-[:T]-  -[:T]-  with optional *min..max
    val leftArrow = p.next() match {
      case "-" => false
      case "<-" => true
      case t => throw NqlParseException(s"cypher: expected edge, got $t")
    }
    p.expect("[")
    val etype = if (p.accept(":")) Some(p.next()) else None
    var (minH, maxH) = (1, 1)
    if (p.accept("*")) {
      minH = p.next().toInt; p.expect(".."); maxH = p.next().toInt
      if (minH < 1 || maxH < minH || maxH > 8)
        throw NqlParseException("cypher: hop range must satisfy 1 <= min <= max <= 8")
    }
    p.expect("]")
    val rightArrow = p.next() match {
      case "->" => true
      case "-" => false
      case t => throw NqlParseException(s"cypher: expected -> or -, got $t")
    }
    val dir = (leftArrow, rightArrow) match {
      case (false, true) => 1
      case (true, false) => -1
      case (false, false) => 0
      case _ => throw NqlParseException("cypher: invalid edge direction")
    }
    EdgePat(etype, minH, maxH, dir)
  }

  private def parseConds(p: P): Seq[Cond] = {
    val out = Seq.newBuilder[Cond]
    var go = true
    while (go) {
      val colName = p.next()
      val op = p.next() match {
        case "<>" => "!="
        case o @ ("=" | "!=" | "<" | "<=" | ">" | ">=") => o
        case o => throw NqlParseException(s"cypher: unsupported operator $o")
      }
      val raw = p.next()
      val v: Any = if (raw.startsWith("'")) raw.substring(1, raw.length - 1) else raw.toLong
      out += Cond(colName, op, v)
      go = p.accept("AND")
    }
    out.result()
  }
}
