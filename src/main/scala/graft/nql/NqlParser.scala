package graft.nql

import scala.util.matching.Regex

/** Tokenizer + recursive-descent parser for the NQL-specific statements.
  * Keyword dispatch mirrors the reference router's first-token dispatch
  * (`query_router/src/lib.rs:1511-1537`); anything starting with a
  * SQL keyword becomes a [[SqlPassthrough]] for Catalyst.
  */
object NqlParser {

  private val sqlKeywords = Set(
    "SELECT", "WITH", "INSERT", "CREATE", "DROP", "ALTER", "SHOW",
    "DESCRIBE", "DESC", "EXPLAIN", "VALUES", "UPDATE", "DELETE", "TABLE")

  private val tokenRe: Regex =
    """\s*(?:('(?:[^'\\]|\\.)*')|(-?\d+\.\d+)|(-?\d+)|([A-Za-z_][A-Za-z0-9_.]*)|(<=|>=|!=|<>|->|=|<|>|\*|,|\(|\)|\[|\]|\{|\}|:))""".r

  private def tokenize(q: String): Vector[String] = {
    var rest = q.trim
    val out = Vector.newBuilder[String]
    while (rest.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          out += m.group(0).trim
          rest = rest.substring(m.end)
        case None => throw NqlParseException(s"cannot tokenize at: ${rest.take(30)}")
      }
    }
    out.result()
  }

  /** Parser state over the token vector. */
  private final class P(ts: Vector[String]) {
    var i = 0
    def peek: Option[String] = if (i < ts.length) Some(ts(i)) else None
    def peekUpper: Option[String] = peek.map(_.toUpperCase)
    def next(): String = {
      if (i >= ts.length) throw NqlParseException("unexpected end of statement")
      val t = ts(i); i += 1; t
    }
    def expectKw(kw: String): Unit = {
      val t = next()
      if (t.toUpperCase != kw) throw NqlParseException(s"expected $kw, got $t")
    }
    def accept(kw: String): Boolean =
      if (peekUpper.contains(kw)) { i += 1; true } else false
    def stringLit(): String = {
      val t = next()
      if (!t.startsWith("'")) throw NqlParseException(s"expected string literal, got $t")
      t.substring(1, t.length - 1).replace("\\'", "'")
    }
    def int(): Int = {
      val t = next()
      val v = try t.toInt catch {
        case _: NumberFormatException =>
          throw NqlParseException(s"expected an integer, got $t")
      }
      // every grammar int is a count/id/percent (the reference parses
      // these as unsigned, parser.rs); a negative here would otherwise
      // leak Spark's untyped AnalysisException from limit()/offset()
      if (v < 0) throw NqlParseException(s"expected a non-negative integer, got $t")
      v
    }
    def num(): Double = {
      val t = next()
      try t.toDouble catch {
        case _: NumberFormatException =>
          throw NqlParseException(s"expected a number, got $t")
      }
    }
    def done: Boolean = i >= ts.length
  }

  def parse(query: String): Statement = {
    val trimmed = query.trim.stripSuffix(";")
    if (trimmed.isEmpty) throw NqlParseException("empty query")
    // dispatch on the first word before touching the NQL lexer — SQL and
    // Cypher have their own richer token sets
    val firstWord = trimmed.takeWhile(!_.isWhitespace).toUpperCase
    // Cypher writes: CREATE/MERGE followed directly by a node pattern
    // (SQL CREATE TABLE etc. never has '(' as the next token)
    val afterFirst = trimmed.drop(firstWord.length).trim
    if ((firstWord == "CREATE" || firstWord == "MERGE") && afterFirst.startsWith("("))
      return CypherParser.parseWrite(trimmed, merge = firstWord == "MERGE")
    // UPDATE/DELETE execute via TableDml's copy-on-write path — Catalyst
    // can parse but not execute them against plain parquet tables.
    if (firstWord == "UPDATE" || firstWord == "DELETE")
      return graft.relational.TableDml.parse(trimmed)
    // SHOW EMBEDDINGS / SHOW VECTOR INDEX and DESCRIBE NODE/EDGE are
    // reference statements Catalyst cannot resolve — intercept them
    // before SQL passthrough; every other SHOW/DESCRIBE stays Catalyst's.
    if (firstWord == "SHOW" || firstWord == "DESCRIBE" || firstWord == "DESC") {
      val second = afterFirst.takeWhile(!_.isWhitespace).toUpperCase
      (firstWord, second) match {
        case ("SHOW", "EMBEDDINGS") =>
          val p = new P(tokenize(trimmed)); p.next(); p.next()
          val limit = if (p.accept("LIMIT")) Some(p.int()) else None
          if (!p.done) throw NqlParseException("SHOW EMBEDDINGS takes only LIMIT n")
          return EmbedList(None, limit)
        case ("SHOW", "VECTOR") =>
          val p = new P(tokenize(trimmed)); p.next(); p.next()
          p.expectKw("INDEX")
          if (!p.done) throw NqlParseException("SHOW VECTOR INDEX takes no arguments")
          return ShowVectorIndex()
        case (_, "NODE") if firstWord != "SHOW" =>
          val p = new P(tokenize(trimmed)); p.next(); p.next()
          val label = { val t = p.next(); if (t.startsWith("'")) t.substring(1, t.length - 1) else t }
          if (!p.done) throw NqlParseException("DESCRIBE NODE takes one label")
          return DescribeNode(label)
        case (_, "EDGE") if firstWord != "SHOW" =>
          val p = new P(tokenize(trimmed)); p.next(); p.next()
          val et = { val t = p.next(); if (t.startsWith("'")) t.substring(1, t.length - 1) else t }
          if (!p.done) throw NqlParseException("DESCRIBE EDGE takes one type")
          return DescribeEdge(et)
        case _ => return SqlPassthrough(trimmed)
      }
    }
    if (sqlKeywords.contains(firstWord)) return SqlPassthrough(trimmed)
    if (firstWord == "MATCH") return CypherParser.parse(trimmed)
    // GRAPH PATTERN MATCH <cypher> — the reference shell's advertised
    // spelling (help.rs:217); delegate to the Cypher MATCH path (its
    // parser gives the typed RETURN-required error when applicable)
    if (firstWord == "GRAPH" && afterFirst.toUpperCase.startsWith("PATTERN MATCH"))
      return CypherParser.parse("MATCH " + afterFirst.drop("PATTERN MATCH".length).trim)
    // GRAPH MATCH COUNT/EXISTS <cypher pattern>: the pattern tail uses the
    // Cypher token set (-[:T]->), so it is delegated before NQL tokenizing
    if (firstWord == "GRAPH" && afterFirst.toUpperCase.startsWith("MATCH")) {
      val tail = afterFirst.drop("MATCH".length).trim
      val mode = tail.takeWhile(!_.isWhitespace).toUpperCase
      val pattern = tail.drop(mode.length).trim
      val m = CypherParser.parsePattern(pattern)
      return mode match {
        case "COUNT" => GraphMatchCount(m)
        case "EXISTS" => GraphMatchExists(m)
        case other => throw NqlParseException(
          s"GRAPH MATCH expects COUNT or EXISTS, got $other")
      }
    }
    val ts = tokenize(trimmed)
    val head = ts.head.toUpperCase
    val p = new P(ts)
    head match {
      case "SIMILAR"   => p.next(); parseSimilar(p)
      case "NEIGHBORS" => p.next(); parseNeighbors(p)
      case "PATH"      => p.next(); parsePath(p)
      case "NODE"      => p.next(); parseNode(p)
      case "EDGE"      => p.next(); parseEdge(p)
      case "DEGREE"    => p.next(); Degree(p.stringLit())
      case "GRAPH"     => p.next(); parseGraph(p)
      case "EMBED"     => p.next(); parseEmbed(p)
      case "ENTITY"    => p.next(); parseEntity(p)
      case "FIND"      => p.next(); parseFind(p)
      case "AGGREGATE" => p.next(); parseAggregateStmt(p)
      case "BATCH"     => p.next(); parseBatchStmt(p)
      case "COUNT"     =>
        p.next(); p.expectKw("EMBEDDINGS")
        if (!p.done) throw NqlParseException("COUNT EMBEDDINGS takes no arguments")
        CountEmbeddings()
      case "CONSTRAINT" => p.next(); parseConstraint(p)
      case "ASOF"      => p.next(); parseAsof(p)
      case "SAMPLE"    => p.next(); parseSample(p)
      case "DEDUP"     => p.next(); parseDedup(p)
      case "BLOBS"     =>
        p.next(); p.expectKw("SIMILAR"); p.expectKw("TO")
        val key = p.stringLit()
        val limit = if (p.accept("LIMIT")) p.int() else 10
        if (!p.done) throw NqlParseException("BLOBS SIMILAR TO takes only LIMIT after the key")
        BlobsSimilar(key, limit)
      case "TRAVERSE"  =>
        p.next(); p.expectKw("FROM")
        val from = p.stringLit()
        p.expectKw("DEPTH")
        val depth = p.int()
        if (depth < 1 || depth > 8)
          throw NqlParseException(s"TRAVERSE depth must be in 1..8, got $depth")
        val etype = if (p.accept("TYPE")) Some(p.stringLit()) else None
        val label = if (p.accept("LABEL")) Some(p.stringLit()) else None
        if (!p.done) throw NqlParseException("TRAVERSE takes FROM, DEPTH, then optional TYPE and LABEL")
        Traverse(from, depth, etype, label)
      case "WALK"      =>
        p.next(); p.expectKw("FROM")
        val from = p.stringLit()
        p.expectKw("STEPS")
        val steps = p.int()
        if (steps < 1 || steps > 6)
          throw NqlParseException(s"WALK steps must be in 1..6, got $steps")
        if (!p.done) throw NqlParseException("WALK takes FROM '<key>' STEPS n")
        Walk(from, steps)
      case "HYBRID"    =>
        p.next()
        val term = p.stringLit()
        if (!term.matches("[A-Za-z0-9_-]+"))
          throw NqlParseException(s"HYBRID term must be a plain word, got '$term'")
        p.expectKw("VECTOR")
        val vid = p.int()
        val limit = if (p.accept("LIMIT")) p.int() else 10
        if (!p.done) throw NqlParseException("HYBRID takes '<term>' VECTOR <id> [LIMIT k]")
        Hybrid(term, vid.toLong, limit)
      case "REBALANCE" =>
        p.next()
        val table = p.next()
        p.expectKw("BY"); val byCol = p.next()
        p.expectKw("BUDGET"); val pct = p.int()
        if (pct < 1 || pct > 100)
          throw NqlParseException(s"REBALANCE budget must be in 1..100, got $pct")
        p.expectKw("KEY"); val keyCol = p.next()
        Rebalance(table, byCol, pct, keyCol)
      case "SEMDEDUP"  =>
        p.next()
        val table = p.next()
        p.expectKw("BY"); val byCol = p.next()
        p.expectKw("THRESHOLD"); val pct = p.int()
        if (pct < 1 || pct > 99)
          throw NqlParseException(s"SEMDEDUP threshold must be in 1..99 (pct of cosine), got $pct")
        p.expectKw("KEY"); val keyCol = p.next()
        p.expectKw("VECTOR"); val vecCol = p.next()
        if (!p.done) throw NqlParseException(
          "SEMDEDUP takes <table> BY <col> THRESHOLD <pct> KEY <col> VECTOR <col>")
        SemDedup(table, byCol, pct, keyCol, vecCol)
      case "BPE"       =>
        p.next(); p.expectKw("TRAIN"); p.expectKw("ROUNDS")
        val n = p.int()
        if (n < 1 || n > 6)
          throw NqlParseException(s"BPE TRAIN rounds must be in 1..6, got $n")
        if (!p.done) throw NqlParseException("BPE takes TRAIN ROUNDS n")
        BpeTrain(n)
      case "HEAVY"     =>
        p.next(); p.expectKw("HITTERS")
        val k = if (p.accept("TOP")) p.int() else 20
        if (k < 1 || k > 100)
          throw NqlParseException(s"HEAVY HITTERS top must be in 1..100, got $k")
        if (!p.done) throw NqlParseException("HEAVY HITTERS takes optional TOP k")
        HeavyHitters(k)
      case "CHUNK"     =>
        p.next(); p.expectKw("WINDOW")
        val w = p.int()
        p.expectKw("STRIDE")
        val st = p.int()
        if (w < 1 || w > 100000)
          throw NqlParseException(s"CHUNK window must be in 1..100000, got $w")
        if (st < 1 || st > w)
          throw NqlParseException(s"CHUNK stride must be in 1..window($w), got $st")
        if (!p.done) throw NqlParseException("CHUNK takes WINDOW w STRIDE s")
        ChunkCensus(w, st)
      case "MMR"       =>
        p.next()
        val vid = p.int()
        val pool = if (p.accept("POOL")) p.int() else 20
        val k = if (p.accept("LIMIT")) p.int() else 5
        if (pool < 2 || pool > 1000)
          throw NqlParseException(s"MMR pool must be in 2..1000, got $pool")
        if (k < 1 || k > pool)
          throw NqlParseException(s"MMR limit must be in 1..pool($pool), got $k")
        if (!p.done) throw NqlParseException("MMR takes <id> [POOL p] [LIMIT k]")
        MmrRerank(vid.toLong, pool, k)
      case other        => throw NqlParseException(s"unknown statement: $other")
    }
  }

  private def parseSimilar(p: P): Statement = {
    if (p.peekUpper.contains("VECTOR")) { p.next(); return parseSimilarVector(p) }
    // reference inline-vector query form: SIMILAR [v, …] …
    if (p.peek.contains("[")) return parseSimilarVector(p)
    if (p.peekUpper.contains("RANGE")) {
      p.next()
      val key = p.stringLit()
      p.expectKw("THRESHOLD")
      val pct = p.int()
      if (pct < 1 || pct > 100)
        throw NqlParseException(s"SIMILAR RANGE threshold must be in 1..100, got $pct")
      val m = if (p.accept("METRIC")) parseMetric(p) else Metric.Cosine
      if (!p.done) throw NqlParseException(
        "SIMILAR RANGE takes '<key>' THRESHOLD <pct> [METRIC m]")
      return SimilarRange(key, pct, m)
    }
    // key: quoted (our round-1 spelling) or bare ident (the router's
    // legacy surface: `SIMILAR doc1 TOP 2`, query_router lib.rs:6903-6929)
    val key = identOrString(p)
    var s = Similar(key)
    var continue = true
    while (continue && !p.done) {
      p.peekUpper match {
        case Some("METRIC") =>
          p.next(); s = s.copy(metric = parseMetric(p))
        // bare trailing metric, the reference spelling (`SIMILAR 'doc1'
        // LIMIT 10 COSINE`, parser.rs similar tests)
        case Some("COSINE") => p.next(); s = s.copy(metric = Metric.Cosine)
        case Some("EUCLIDEAN") => p.next(); s = s.copy(metric = Metric.Euclidean)
        case Some("DOT" | "DOT_PRODUCT") => p.next(); s = s.copy(metric = Metric.Dot)
        case Some("CONNECTED") =>
          p.next(); p.expectKw("TO"); s = s.copy(connectedTo = Some(p.stringLit()))
        case Some("WHERE") =>
          p.next(); s = s.copy(where = parseConds(p))
        case Some("LIMIT" | "TOP") => // TOP = router legacy limit spelling
          p.next(); s = s.copy(limit = p.int())
        case Some("USING") =>
          p.next(); p.expectKw("INDEX")
          val nprobe = if (p.accept("PROBES")) p.int() else 1
          if (nprobe < 1) throw NqlParseException(s"PROBES must be >= 1, got $nprobe")
          s = s.copy(usingIndex = Some(nprobe))
        case Some("IN" | "INTO") =>
          p.next(); s = s.copy(collection = Some(identOrString(p)))
        case _ => continue = false
      }
    }
    s
  }

  private def parseNeighbors(p: P): Neighbors = {
    val key = p.stringLit()
    var n = Neighbors(key)
    // reference direction keywords (parser.rs:1707-1715); default BOTH
    if (p.accept("OUTGOING")) n = n.copy(direction = "out")
    else if (p.accept("INCOMING")) n = n.copy(direction = "in")
    else if (p.accept("BOTH")) n = n.copy(direction = "both")
    var continue = true
    while (continue && !p.done) {
      p.peekUpper match {
        case Some("TYPE") => p.next(); n = n.copy(etype = Some(identOrString(p)))
        case Some("BY") =>
          p.next(); p.expectKw("SIMILARITY"); p.expectKw("TO")
          n = n.copy(bySimilarityTo = Some(p.stringLit()))
        case Some("LIMIT") => p.next(); n = n.copy(limit = Some(p.int()))
        case _ => continue = false
      }
    }
    n
  }

  /** `PATH [SHORTEST|WEIGHTED] 'a' TO|-> 'b' [MAX|LIMIT n]` — the
    * algorithm keyword is optional (reference defaults to Shortest and
    * spells the pair with an arrow and the depth cap LIMIT,
    * `parser.rs:1746-1775`). */
  private def parsePath(p: P): Statement = {
    val kind =
      if (p.peekUpper.exists(k => k == "SHORTEST" || k == "WEIGHTED")) p.next().toUpperCase
      else "SHORTEST"
    val from = p.stringLit()
    if (!p.accept("TO")) p.expectKw("->")
    val to = p.stringLit()
    val depth = if (p.accept("MAX") || p.accept("LIMIT")) Some(p.int()) else None
    kind match {
      case "SHORTEST" => PathShortest(from, to, depth.getOrElse(6))
      case _ => PathWeighted(from, to, depth.getOrElse(6))
    }
  }

  private def parseNode(p: P): Statement = p.next().toUpperCase match {
    case "GET" =>
      val k = p.stringLit()
      if (!p.done) throw NqlParseException("NODE GET takes one key")
      NodeGet(k)
    case "BATCH" =>
      p.expectKw("CREATE")
      val items = Seq.newBuilder[BatchNode]
      var go = true
      while (go) {
        val key = p.stringLit()
        val label = if (p.accept("LABEL")) p.stringLit() else "node"
        val name = if (p.accept("NAME")) Some(p.stringLit()) else None
        items += BatchNode(key, label, name)
        go = p.accept("AND")
      }
      if (!p.done) throw NqlParseException(
        "NODE BATCH CREATE takes 'key' [LABEL 'l'] [NAME 'n'] AND ...")
      NodeBatchCreate(items.result())
    case "LIST" =>
      // label: our LABEL 'x' spelling or the reference's bare `NODE LIST
      // Person LIMIT 10 OFFSET 5` (parser.rs NodeList tests)
      val label =
        if (p.accept("LABEL")) Some(p.stringLit())
        else if (!p.done && !Set("LIMIT", "OFFSET").contains(p.peekUpper.get))
          Some(identOrString(p))
        else None
      val limit = if (p.accept("LIMIT")) Some(p.int()) else None
      val offset = if (p.accept("OFFSET")) Some(p.int()) else None
      if (!p.done) throw NqlParseException(
        "NODE LIST takes [label] [LIMIT n] [OFFSET n]")
      NodeList(label, limit, offset)
    case "CREATE" =>
      if (p.peek.exists(_.startsWith("'"))) {
        // round-1 spelling: NODE CREATE 'key' [LABEL 'l'] [NAME 'n']
        val key = p.stringLit()
        val label = if (p.accept("LABEL")) p.stringLit() else "node"
        val name = if (p.accept("NAME")) Some(p.stringLit()) else None
        NodeCreate(key, label, name)
      } else {
        // reference spelling: NODE CREATE <label> {k: v, ...}, or the
        // router's legacy pair form NODE CREATE <label> k=v k2=v2
        // (query_router lib.rs NODE CREATE tests). The reference
        // auto-assigns an integer id; this engine keys nodes by string,
        // so the item must carry a key: or name: property — stated
        // loudly otherwise.
        val label = identOrString(p)
        val props =
          if (p.peek.contains("{")) parseBraceObj(p)._2
          else {
            var m = Map.empty[String, String]
            while (!p.done && p.peek.exists(t => t.head.isLetter || t.head == '_')) {
              val k = p.next(); p.expectKw("="); m += (k -> scalarToken(p))
            }
            m
          }
        if (!p.done) throw NqlParseException(
          "NODE CREATE takes <label> {k: v, ...} or <label> k=v k2=v2 ...")
        val key = props.get("key").orElse(props.get("name")).getOrElse(
          throw NqlParseException(
            "NODE CREATE needs a key: or name: property " +
              "(this engine keys nodes by string, it does not auto-assign ids)"))
        NodeCreate(key, label, props.get("name"), props - "key")
      }
    case "DELETE" =>
      val k = p.stringLit()
      if (!p.done) throw NqlParseException("NODE DELETE takes one key")
      NodeDelete(k)
    case k => throw NqlParseException(s"unknown NODE op $k")
  }

  private def parseEdge(p: P): Statement = p.next().toUpperCase match {
    case "BATCH" =>
      p.expectKw("CREATE")
      val items = Seq.newBuilder[(String, String, String)]
      var go = true
      while (go) {
        val src = p.stringLit(); p.expectKw("TO"); val dst = p.stringLit()
        val etype = if (p.accept("TYPE")) p.stringLit() else "related"
        items += ((src, dst, etype))
        go = p.accept("AND")
      }
      if (!p.done) throw NqlParseException(
        "EDGE BATCH CREATE takes 'a' TO 'b' [TYPE 't'] AND ...")
      EdgeBatchCreate(items.result())
    case "LIST" =>
      // type: our TYPE 'x' spelling or the reference's bare `EDGE LIST
      // FOLLOWS LIMIT 25 OFFSET 50`
      val etype =
        if (p.accept("TYPE")) Some(p.stringLit())
        else if (!p.done && !Set("LIMIT", "OFFSET").contains(p.peekUpper.get))
          Some(identOrString(p))
        else None
      val limit = if (p.accept("LIMIT")) Some(p.int()) else None
      val offset = if (p.accept("OFFSET")) Some(p.int()) else None
      if (!p.done) throw NqlParseException(
        "EDGE LIST takes [type] [LIMIT n] [OFFSET n]")
      EdgeList(etype, limit, offset)
    case "CREATE" =>
      val src = p.stringLit(); p.expectKw("TO"); val dst = p.stringLit()
      val etype = if (p.accept("TYPE")) p.stringLit() else "related"
      EdgeCreate(src, dst, etype)
    case "DELETE" =>
      val src = p.stringLit(); p.expectKw("TO"); val dst = p.stringLit()
      val etype = if (p.accept("TYPE")) p.stringLit() else "related"
      EdgeDelete(src, dst, etype)
    case k => throw NqlParseException(s"unknown EDGE op $k")
  }

  private def parseEmbed(p: P): Statement = {
    val op = p.next()
    parseEmbedOp(p, op)
  }

  private def parseEmbedOp(p: P, op: String): Statement = op.toUpperCase match {
    case "GET" =>
      val k = p.stringLit()
      // reference allows `EMBED GET 'k' INTO coll`; keys are global in
      // this engine, so the collection operand narrows nothing — accept
      // the spelling, look up by key
      if (p.accept("IN") || p.accept("INTO")) identOrString(p)
      if (!p.done) throw NqlParseException("EMBED GET takes 'key' [INTO collection]")
      EmbedGet(k)
    case "DELETE" =>
      val key = p.stringLit()
      // same key-global rationale as EMBED GET for the INTO operand
      if (p.accept("IN") || p.accept("INTO")) identOrString(p)
      if (!p.done) throw NqlParseException("EMBED DELETE takes 'key' [INTO collection]")
      EmbedDelete(key)
    case "LIST" =>
      val coll = if (p.accept("IN") || p.accept("INTO")) Some(identOrString(p)) else None
      val limit = if (p.accept("LIMIT")) Some(p.int()) else None
      if (!p.done) throw NqlParseException("EMBED LIST takes optional IN '<collection>' and LIMIT n")
      EmbedList(coll, limit)
    case "STORE" =>
      val key = p.stringLit()
      val vec = parseVector(p)
      val coll = if (p.accept("IN") || p.accept("INTO")) Some(identOrString(p)) else None
      EmbedStore(key, vec, coll)
    case "BATCH" =>
      val items = Seq.newBuilder[(String, Array[Float])]
      if (p.peek.contains("[")) {
        // reference tuple-list spelling (`parser.rs` EmbedBatch tests):
        // EMBED BATCH [('k1', [1.0]), ('k2', [2.0])] [INTO coll]
        p.expectKw("[")
        if (!p.peek.contains("]")) {
          var more = true
          while (more) {
            p.expectKw("(")
            val k = p.stringLit()
            p.expectKw(",")
            items += ((k, parseVector(p)))
            p.expectKw(")")
            more = p.accept(",")
          }
        }
        p.expectKw("]")
      } else {
        var go = true
        while (go) {
          val k = p.stringLit()
          items += ((k, parseVector(p)))
          go = p.accept(",")
        }
      }
      val coll = if (p.accept("IN") || p.accept("INTO")) Some(identOrString(p)) else None
      if (!p.done) throw NqlParseException(
        "EMBED BATCH takes 'key' (v, ...), ... or [('key', [v, ...]), ...] [IN '<collection>']")
      val out = items.result()
      if (out.isEmpty) throw NqlParseException("EMBED BATCH needs at least one item")
      EmbedBatch(out, coll)
    case "BUILD" =>
      // reference writes plain `EMBED BUILD INDEX` (parser.rs EmbedBuild
      // test); IVF is this engine's only index family, so it's implied
      p.expectKw("INDEX"); p.accept("IVF")
      val clusters = if (p.accept("CLUSTERS")) Some(p.int()) else None
      EmbedBuildIndex(clusters)
    case "DROP" =>
      p.expectKw("INDEX")
      EmbedDropIndex()
    case "COLLECTION" =>
      p.expectKw("CREATE")
      val name = p.stringLit()
      p.expectKw("DIMENSION")
      val dim = p.int()
      if (dim <= 0) throw NqlParseException(s"DIMENSION must be positive, got $dim")
      val metric = if (p.accept("METRIC")) parseMetric(p) else Metric.Cosine
      EmbedCollectionCreate(name, dim, metric)
    // router legacy shorthand `EMBED <key> [v, ...]` (query_router
    // lib.rs:6620): the op token IS the key when a vector literal follows
    case _ if p.peek.exists(t => t == "[" || t == "(") =>
      val key = if (op.startsWith("'")) op.substring(1, op.length - 1).replace("\\'", "'") else op
      val vec = parseVector(p)
      val coll = if (p.accept("IN") || p.accept("INTO")) Some(identOrString(p)) else None
      if (!p.done) throw NqlParseException("EMBED <key> [v, ...] takes optional INTO collection")
      EmbedStore(key, vec, coll)
    case k => throw NqlParseException(s"unknown EMBED op $k")
  }

  private def parseMetric(p: P): Metric = p.next().toUpperCase match {
    case "COSINE" => Metric.Cosine
    case "EUCLIDEAN" => Metric.Euclidean
    case "DOT" | "DOT_PRODUCT" => Metric.Dot
    case m => throw NqlParseException(s"unknown metric $m")
  }

  private def parseEntity(p: P): Statement = p.next().toUpperCase match {
    case "GET" =>
      val k = p.stringLit()
      if (!p.done) throw NqlParseException("ENTITY GET takes one key")
      EntityGet(k)
    case "BATCH" =>
      p.expectKw("CREATE")
      val items = Seq.newBuilder[(String, Map[String, String])]
      if (p.peek.contains("[")) {
        // reference brace-list spelling (`ENTITY BATCH CREATE [{key:
        // 'k1', name: 'First'}, ...]`, parser.rs EntityBatch tests);
        // each item must carry its key: property
        parseBraceList(p).zipWithIndex.foreach { case ((labels, props), i) =>
          if (labels.nonEmpty) throw NqlParseException(
            s"ENTITY BATCH CREATE item ${i + 1}: labels: belongs to nodes")
          val key = props.getOrElse("key", throw NqlParseException(
            s"ENTITY BATCH CREATE item ${i + 1}: missing 'key'"))
          items += ((key, props - "key"))
        }
      } else {
        var go = true
        while (go) {
          val key = p.stringLit()
          var props = Map.empty[String, String]
          if (p.accept("SET")) {
            var more = true
            while (more) {
              val k = p.next(); p.expectKw("="); val v = p.stringLit()
              props += (k -> v)
              more = p.accept(",")
            }
          }
          items += ((key, props))
          go = p.accept("AND")
        }
      }
      if (!p.done) throw NqlParseException(
        "ENTITY BATCH CREATE takes 'key' [SET k = 'v', ...] AND ... or [{key: 'k', ...}, ...]")
      EntityBatchCreate(items.result())
    case "DELETE" =>
      val k = p.stringLit()
      if (!p.done) throw NqlParseException("ENTITY DELETE takes one key")
      EntityDelete(k)
    case "CONNECT" =>
      // TO ... TYPE 't' (round-1) or the reference's arrow spelling
      // `ENTITY CONNECT 'a' -> 'b' : follows` (lib.rs EntityConnect tests)
      val src = p.stringLit()
      if (!p.accept("->")) p.expectKw("TO")
      val dst = p.stringLit()
      val etype =
        if (p.accept("TYPE")) p.stringLit()
        else if (p.accept(":")) identOrString(p)
        else "related"
      EntityConnect(src, dst, etype)
    case "CREATE" =>
      val key = p.stringLit()
      var props = Map.empty[String, String]
      if (p.peek.contains("{")) {
        // reference brace-props spelling (`ENTITY CREATE 'user:1'
        // { name: 'Alice', age: '30' }`, lib.rs EntityCreate tests)
        props = parseBraceObj(p)._2
      } else if (p.accept("SET")) {
        var go = true
        while (go) {
          val k = p.next(); p.expectKw("="); val v = p.stringLit()
          props += (k -> v)
          go = p.accept(",")
        }
      }
      val emb = if (p.accept("EMBEDDING")) Some(parseVector(p)) else None
      EntityCreate(key, props, emb)
    case "UPDATE" =>
      val key = p.stringLit()
      var props = Map.empty[String, String]
      if (p.peek.contains("{")) {
        // reference brace-props spelling (`ENTITY UPDATE 'user:1'
        // {name: 'Bob'} [EMBEDDING [v, ...]]`, parser.rs EntityUpdate tests)
        props = parseBraceObj(p)._2
      } else {
        p.expectKw("SET")
        var go = true
        while (go) {
          val k = p.next(); p.expectKw("="); val v = p.stringLit()
          props += (k -> v)
          go = p.accept(",")
        }
      }
      val emb = if (p.accept("EMBEDDING")) Some(parseVector(p)) else None
      if (!p.done) throw NqlParseException(
        "ENTITY UPDATE takes '<key>' SET k = 'v', ... or '<key>' {k: v, ...} [EMBEDDING [v, ...]]")
      EntityUpdate(key, props, emb)
    case k => throw NqlParseException(s"unknown ENTITY op $k")
  }

  /** `( num, num, ... )` */
  private def parseSimilarVector(p: P): SimilarVector = {
    var s = SimilarVector(parseVector(p).toSeq)
    var continue = true
    while (continue && !p.done) {
      p.peekUpper match {
        case Some("METRIC") =>
          p.next()
          s = s.copy(metric = p.next().toUpperCase match {
            case "COSINE" => Metric.Cosine
            case "EUCLIDEAN" => Metric.Euclidean
            case "DOT" | "DOT_PRODUCT" => Metric.Dot
            case m => throw NqlParseException(s"unknown metric $m")
          })
        // bare trailing metric + INTO collection (reference spellings:
        // `SIMILAR [1.0, 2.0] LIMIT 10 EUCLIDEAN`, `... INTO my_collection`)
        case Some("COSINE") => p.next(); s = s.copy(metric = Metric.Cosine)
        case Some("EUCLIDEAN") => p.next(); s = s.copy(metric = Metric.Euclidean)
        case Some("DOT" | "DOT_PRODUCT") => p.next(); s = s.copy(metric = Metric.Dot)
        case Some("IN" | "INTO") =>
          p.next(); s = s.copy(collection = Some(identOrString(p)))
        case Some("WHERE") =>
          p.next(); s = s.copy(where = parseConds(p))
        case Some("LIMIT" | "TOP") => // TOP = router legacy limit spelling
          p.next(); s = s.copy(limit = p.int())
        case _ => continue = false
      }
    }
    s
  }

  /** Vector literal: our `(v, …)` round-1 spelling or the reference's
    * bracket form `[v, …]` (`parser.rs:1781-1790`). */
  private def parseVector(p: P): Array[Float] = {
    val close = if (p.accept("[")) "]" else { p.expectKw("("); ")" }
    val out = Array.newBuilder[Float]
    var go = true
    while (go) {
      val t = p.next()
      out += (try t.toFloat catch {
        case _: NumberFormatException =>
          throw NqlParseException(s"expected a number in vector literal, got $t")
      })
      go = p.accept(",")
    }
    p.expectKw(close)
    out.result()
  }

  /** GRAPH COUNT / GRAPH AGGREGATE statement forms (reference
    * CountNodes/CountEdges/AggregateNodeProperty/AggregateEdgeProperty,
    * `ast.rs:1430-1487`); anything else is a GRAPH algorithm. */
  private def parseGraph(p: P): Statement = p.peekUpper match {
    case Some("COUNT") =>
      p.next()
      p.next().toUpperCase match {
        case "NODES" =>
          val label = if (p.accept("LABEL")) Some(p.stringLit()) else None
          if (!p.done) throw NqlParseException("GRAPH COUNT NODES takes only optional LABEL '<x>'")
          GraphCountNodes(label)
        case "EDGES" =>
          val etype = if (p.accept("TYPE")) Some(p.stringLit()) else None
          if (!p.done) throw NqlParseException("GRAPH COUNT EDGES takes only optional TYPE '<x>'")
          GraphCountEdges(etype)
        case k => throw NqlParseException(s"GRAPH COUNT expects NODES or EDGES, got $k")
      }
    // The reference shell's help screen advertises GRAPH ALGORITHM /
    // GRAPH CONSTRAINT / GRAPH BATCH prefixed spellings that its own
    // parser then rejects (help.rs:158-225 vs parser.rs:2338-2359) —
    // accept them here so everything the reference documents runs.
    case Some("ALGORITHM") => p.next(); parseGraphAlgo(p)
    case Some("CONSTRAINT") => p.next(); parseConstraint(p)
    case Some("BATCH") => p.next(); parseBatchStmt(p)
    case Some("AGGREGATE") =>
      p.next()
      val func = p.next().toUpperCase
      if (!Set("SUM", "AVG", "MIN", "MAX", "COUNT").contains(func))
        throw NqlParseException(s"GRAPH AGGREGATE expects SUM/AVG/MIN/MAX/COUNT, got $func")
      val prop = p.stringLit()
      val (overEdges, filter) = p.next().toUpperCase match {
        case "NODES" => (false, if (p.accept("LABEL")) Some(p.stringLit()) else None)
        case "EDGES" => (true, if (p.accept("TYPE")) Some(p.stringLit()) else None)
        case k => throw NqlParseException(s"GRAPH AGGREGATE expects NODES or EDGES after the property, got $k")
      }
      val where = if (p.accept("WHERE")) parseConds(p) else Nil
      if (!p.done) throw NqlParseException(
        "GRAPH AGGREGATE takes <func> '<prop>' NODES|EDGES [LABEL|TYPE '<x>'] [WHERE ...]")
      GraphAggregate(func, prop, overEdges, filter, where)
    case _ => parseGraphAlgo(p)
  }

  /** A bare identifier or a quoted string — the reference's
    * `expect_ident_or_keyword` sites (property names, labels, edge types)
    * take bare words; our round-1 spellings quote them. Accept both. */
  private def identOrString(p: P): String = {
    val t = p.next()
    if (t.startsWith("'")) t.substring(1, t.length - 1).replace("\\'", "'")
    else if (t.head.isLetter || t.head == '_') t
    else throw NqlParseException(s"expected an identifier or string, got $t")
  }

  /** The reference's literal top-level aggregate spelling
    * (`neumann_parser/src/parser.rs:3081-3151`):
    * `AGGREGATE NODE PROPERTY <prop> <FUNC> [BY LABEL <x>] [WHERE ...]` /
    * `AGGREGATE EDGE PROPERTY <prop> <FUNC> [BY TYPE <x>] [WHERE ...]`.
    * Pure alias: builds the same [[GraphAggregate]] as the shipped
    * `GRAPH AGGREGATE <func> '<prop>' NODES|EDGES [...]` form. */
  private def parseAggregateStmt(p: P): Statement = {
    val overEdges = p.next().toUpperCase match {
      case "NODE" => false
      case "EDGE" => true
      case k => throw NqlParseException(s"AGGREGATE expects NODE or EDGE, got $k")
    }
    p.expectKw("PROPERTY")
    val prop = identOrString(p)
    val func = p.next().toUpperCase
    if (!Set("SUM", "AVG", "MIN", "MAX", "COUNT").contains(func))
      throw NqlParseException(s"AGGREGATE expects SUM/AVG/MIN/MAX/COUNT, got $func")
    // BY LABEL x / BY TYPE x per the grammar (parser.rs:3092-3096); the
    // reference's own tests also write `... SUM ON Person` (its parser
    // silently ignores the trailing tokens there — we honor the intent
    // and apply ON <x> as the label/type filter instead)
    val filter =
      if (p.accept("BY")) {
        p.expectKw(if (overEdges) "TYPE" else "LABEL")
        Some(identOrString(p))
      } else if (p.accept("ON")) Some(identOrString(p))
      else None
    val where = if (p.accept("WHERE")) parseConds(p) else Nil
    if (!p.done) throw NqlParseException(
      "AGGREGATE NODE|EDGE PROPERTY <prop> <FUNC> [BY LABEL|TYPE <x>] [WHERE ...]")
    GraphAggregate(func, prop, overEdges, filter, where)
  }

  /** The reference's literal top-level batch spelling
    * (`neumann_parser/src/parser.rs:2807-3061`):
    * `BATCH CREATE NODES [{labels: [...], k: v, ...}, ...]`,
    * `BATCH CREATE EDGES [{from: x, to: y, type: t}, ...]`,
    * `BATCH DELETE NODES [k1, ...]`, `BATCH UPDATE NODES [{id: k, ...}]`.
    * Aliases onto the shipped batch engines (NodeBatchCreate /
    * EdgeBatchCreate / NodeBatchDelete / NodeBatchUpdate). Adaptations,
    * stated loudly rather than silently diverging: this engine's node
    * identity is a string key (the reference auto-assigns integer ids),
    * so each created node must carry a `key:` or `name:` property;
    * overlay edges carry no properties, so edge props beyond
    * from/to/type are rejected; `BATCH DELETE EDGES [ids]` is rejected
    * because edges here have identity (src, dst, type), not ids. */
  private def parseBatchStmt(p: P): Statement = p.next().toUpperCase match {
    case "CREATE" => p.next().toUpperCase match {
      case "NODE" | "NODES" =>
        val items = parseBraceList(p).zipWithIndex.map { case ((labels, props), i) =>
          val key = props.get("key").orElse(props.get("name")).getOrElse(
            throw NqlParseException(
              s"BATCH CREATE NODES item ${i + 1} needs a key: or name: property " +
                "(this engine keys nodes by string, it does not auto-assign ids)"))
          BatchNode(key, labels.headOption.getOrElse("node"), props.get("name"),
            props - "key")
        }
        if (!p.done) throw NqlParseException("BATCH CREATE NODES takes one [...] list")
        NodeBatchCreate(items)
      case "EDGE" | "EDGES" =>
        val items = parseBraceList(p).zipWithIndex.map { case ((labels, props), i) =>
          if (labels.nonEmpty) throw NqlParseException(
            s"BATCH CREATE EDGES item ${i + 1}: labels: belongs to nodes")
          val extras = props.keySet -- Set("from", "to", "type")
          if (extras.nonEmpty) throw NqlParseException(
            s"BATCH CREATE EDGES item ${i + 1}: edge properties " +
              s"${extras.toSeq.sorted.mkString(", ")} are not supported — " +
              "overlay edges carry (src, dst, type) only")
          val from = props.getOrElse("from", throw NqlParseException(
            s"BATCH CREATE EDGES item ${i + 1}: missing 'from'"))
          val to = props.getOrElse("to", throw NqlParseException(
            s"BATCH CREATE EDGES item ${i + 1}: missing 'to'"))
          // the reference REQUIRES type here (parser.rs:2984-2989
          // "Missing 'type'") — mirror it; our EDGE BATCH CREATE
          // spelling keeps its 'related' default
          val etype = props.getOrElse("type", throw NqlParseException(
            s"BATCH CREATE EDGES item ${i + 1}: missing 'type'"))
          (from, to, etype)
        }
        if (!p.done) throw NqlParseException("BATCH CREATE EDGES takes one [...] list")
        EdgeBatchCreate(items)
      case k => throw NqlParseException(s"BATCH CREATE expects NODES or EDGES, got $k")
    }
    case "DELETE" => p.next().toUpperCase match {
      case "NODE" | "NODES" =>
        p.expectKw("[")
        val keys = Seq.newBuilder[String]
        if (!p.peek.contains("]")) {
          var go = true
          while (go) { keys += scalarToken(p); go = p.accept(",") }
        }
        p.expectKw("]")
        if (!p.done) throw NqlParseException("BATCH DELETE NODES takes one [k1, ...] list")
        NodeBatchDelete(keys.result())
      case "EDGE" | "EDGES" => throw NqlParseException(
        "BATCH DELETE EDGES by edge id is not supported — edges here have " +
          "identity (src, dst, type), not ids; use EDGE DELETE 'src' TO 'dst' TYPE 't'")
      case k => throw NqlParseException(s"BATCH DELETE expects NODES or EDGES, got $k")
    }
    case "UPDATE" =>
      p.next().toUpperCase match {
        case "NODE" | "NODES" => ()
        case k => throw NqlParseException(s"BATCH UPDATE expects NODES, got $k")
      }
      val items = parseBraceList(p).zipWithIndex.map { case ((labels, props), i) =>
        if (labels.nonEmpty) throw NqlParseException(
          s"BATCH UPDATE NODES item ${i + 1}: labels: cannot be updated")
        val id = props.getOrElse("id", throw NqlParseException(
          s"BATCH UPDATE NODES item ${i + 1}: missing 'id'"))
        (id, props - "id")
      }
      if (!p.done) throw NqlParseException("BATCH UPDATE NODES takes one [...] list")
      NodeBatchUpdate(items)
    case k => throw NqlParseException(s"BATCH expects CREATE, DELETE, or UPDATE, got $k")
  }

  /** One scalar value token — string literal, number, or bare word —
    * normalized to its string form (store props are string-typed). */
  private def scalarToken(p: P): String = {
    val t = p.next()
    if (t.startsWith("'")) t.substring(1, t.length - 1).replace("\\'", "'") else t
  }

  /** One `{k: v, ..., labels: [a, b]}` brace object (the reference's
    * batch item shape, `parser.rs:2880-2933`): returns its labels and
    * its scalar properties (values stringified). */
  private def parseBraceObj(p: P): (Seq[String], Map[String, String]) = {
    p.expectKw("{")
    var labels = Seq.empty[String]
    var props = Map.empty[String, String]
    if (!p.peek.contains("}")) {
      var inner = true
      while (inner) {
        val k = identOrString(p)
        p.expectKw(":")
        if (k == "labels") {
          p.expectKw("[")
          if (!p.peek.contains("]")) {
            var ls = true
            while (ls) { labels :+= identOrString(p); ls = p.accept(",") }
          }
          p.expectKw("]")
        } else props += (k -> scalarToken(p))
        inner = p.accept(",")
      }
    }
    p.expectKw("}")
    (labels, props)
  }

  /** `[{...}, ...]` — list of brace objects. */
  private def parseBraceList(p: P): Seq[(Seq[String], Map[String, String])] = {
    p.expectKw("[")
    val out = Seq.newBuilder[(Seq[String], Map[String, String])]
    if (!p.peek.contains("]")) {
      var more = true
      while (more) { out += parseBraceObj(p); more = p.accept(",") }
    }
    p.expectKw("]")
    out.result()
  }

  private def parseGraphAlgo(p: P): GraphAlgo = {
    val algo = p.next().toUpperCase
    def engine(): String = if (p.accept("ENGINE")) {
      val e = p.stringLit().toLowerCase
      if (e != "dataframe" && e != "graphx")
        throw NqlParseException(s"unknown engine '$e' (expected 'dataframe' or 'graphx')")
      e
    } else "dataframe"
    algo match {
      case "PAGERANK" =>
        // ITERATIONS/DAMPING/TOLERANCE/direction/EDGE TYPE/ENGINE in any
        // order (reference PageRank params, `ast.rs:1267-1279`, grammar
        // `parser.rs:2361-2405`)
        var s = GraphPageRank()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("ITERATIONS") => p.next(); s = s.copy(iterations = p.int())
            case Some("DAMPING") =>
              p.next(); val d = p.num()
              if (d <= 0.0 || d >= 1.0)
                throw NqlParseException(s"DAMPING must be in (0, 1), got $d")
              s = s.copy(damping = d)
            case Some("TOLERANCE") =>
              p.next(); val t = p.num()
              if (t < 0.0) throw NqlParseException(s"TOLERANCE must be >= 0, got $t")
              s = s.copy(tolerance = t)
            case Some("OUTGOING") => p.next(); s = s.copy(direction = Some("out"))
            case Some("INCOMING") => p.next(); s = s.copy(direction = Some("in"))
            case Some("BOTH") => p.next(); s = s.copy(direction = Some("both"))
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case Some("ENGINE") => s = s.copy(engine = engine())
            case _ => continue = false
          }
        }
        s
      case "COMPONENTS" => GraphComponents(engine())
      case "TRIANGLES" =>
        // EDGE TYPE / ENGINE in any order (reference TriangleConfig,
        // `triangles.rs:18,30` — edge_type None = all edge types)
        var s = GraphTriangles()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case Some("ENGINE") => s = s.copy(engine = engine())
            case _ => continue = false
          }
        }
        s
      case "BICONNECTED" => GraphBiconnected()
      case "ARTICULATION" => GraphArticulation()
      case "HITS" =>
        val it = if (p.accept("ITERATIONS")) p.int() else 4
        GraphHits(it)
      case "CLUSTERING" => GraphClustering()
      case "ASSORTATIVITY" => GraphAssortativity()
      case "PPR" =>
        p.expectKw("FROM")
        val from = p.stringLit()
        val it = if (p.accept("ITERATIONS")) p.int() else 8
        if (it < 1 || it > 12)
          throw NqlParseException(s"PPR iterations must be in 1..12, got $it")
        GraphPpr(from, it)
      case "DIAMETER" => GraphDiameter()
      case "CORES" =>
        val k = if (p.accept("MAX")) p.int() else 6
        if (k < 1 || k > 16)
          throw NqlParseException(s"GRAPH CORES max must be in 1..16, got $k")
        GraphCores(k)
      case "TRANSITIVITY" => GraphTransitivity()
      case "EIGENVECTOR" =>
        p.accept("CENTRALITY") // reference writes EIGENVECTOR CENTRALITY
        var s = GraphEigenvector()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("ITERATIONS") =>
              p.next(); val it = p.int()
              // cap 100 (reference accepts any count; each round is one
              // keyed exchange, TOLERANCE gives an early stop)
              if (it < 1 || it > 100)
                throw NqlParseException(s"EIGENVECTOR iterations must be in 1..100, got $it")
              s = s.copy(iterations = it)
            case Some("TOLERANCE") =>
              p.next(); val t = p.num()
              if (t < 0.0) throw NqlParseException(s"TOLERANCE must be >= 0, got $t")
              s = s.copy(tolerance = t)
            case Some("OUTGOING") => p.next(); s = s.copy(direction = Some("out"))
            case Some("INCOMING") => p.next(); s = s.copy(direction = Some("in"))
            case Some("BOTH") => p.next(); s = s.copy(direction = Some("both"))
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case _ => continue = false
          }
        }
        s
      case "BETWEENNESS" =>
        p.accept("CENTRALITY") // reference writes BETWEENNESS CENTRALITY
        var s = GraphBetweenness()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("SAMPLE") | Some("SAMPLING") =>
              // integer = percent (our round-1 spelling); fractional =
              // the reference's sampling ratio (`GRAPH BETWEENNESS
              // CENTRALITY SAMPLING 0.5`, parser.rs betweenness tests)
              p.next()
              val t = p.next()
              val v =
                if (t.contains('.')) {
                  val d = try t.toDouble catch {
                    case _: NumberFormatException =>
                      throw NqlParseException(s"expected a number, got $t")
                  }
                  if (d <= 0.0 || d > 1.0)
                    throw NqlParseException(s"fractional SAMPLING must be in (0, 1], got $d")
                  math.max(1, math.round(d * 100).toInt)
                } else {
                  val i = try t.toInt catch {
                    case _: NumberFormatException =>
                      throw NqlParseException(s"expected an integer, got $t")
                  }
                  if (i < 1 || i > 100)
                    throw NqlParseException(s"BETWEENNESS SAMPLE must be in 1..100, got $i")
                  i
                }
              s = s.copy(samplePct = Some(v))
            case Some("OUTGOING") => p.next(); s = s.copy(direction = Some("out"))
            case Some("INCOMING") => p.next(); s = s.copy(direction = Some("in"))
            case Some("BOTH") => p.next(); s = s.copy(direction = Some("both"))
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case _ => continue = false
          }
        }
        s
      case "CLOSENESS" =>
        p.accept("CENTRALITY")
        var s = GraphCloseness()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("OUTGOING") => p.next(); s = s.copy(direction = Some("out"))
            case Some("INCOMING") => p.next(); s = s.copy(direction = Some("in"))
            case Some("BOTH") => p.next(); s = s.copy(direction = Some("both"))
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case _ => continue = false
          }
        }
        s
      case "LABELPROP" | "LABEL" | "LABEL_PROPAGATION" =>
        if (algo == "LABEL") p.expectKw("PROPAGATION") // reference spelling
        var s = GraphLabelProp()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("ITERATIONS") =>
              p.next(); val it = p.int()
              if (it < 1 || it > 100)
                throw NqlParseException(s"LABELPROP iterations must be in 1..100, got $it")
              s = s.copy(iterations = it)
            case Some("OUTGOING") => p.next(); s = s.copy(direction = Some("out"))
            case Some("INCOMING") => p.next(); s = s.copy(direction = Some("in"))
            case Some("BOTH") => p.next(); s = s.copy(direction = Some("both"))
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case _ => continue = false
          }
        }
        s
      case "LOUVAIN" =>
        p.accept("COMMUNITIES") // reference writes LOUVAIN COMMUNITIES
        var s = GraphLouvain()
        var continue = true
        while (continue && !p.done) {
          p.peekUpper match {
            case Some("SWEEPS") | Some("PASSES") => // PASSES = reference spelling
              p.next(); val sw = p.int()
              if (sw < 1 || sw > 20)
                throw NqlParseException(s"LOUVAIN sweeps must be in 1..20, got $sw")
              s = s.copy(sweeps = sw)
            case Some("RESOLUTION") =>
              p.next(); val r = p.num()
              if (r <= 0.0 || r > 10.0)
                throw NqlParseException(s"LOUVAIN RESOLUTION must be in (0, 10], got $r")
              s = s.copy(resolution = r)
            case Some("OUTGOING") => p.next(); s = s.copy(direction = Some("out"))
            case Some("INCOMING") => p.next(); s = s.copy(direction = Some("in"))
            case Some("BOTH") => p.next(); s = s.copy(direction = Some("both"))
            case Some("EDGE") =>
              p.next(); p.expectKw("TYPE"); s = s.copy(etype = Some(identOrString(p)))
            case _ => continue = false
          }
        }
        s
      case k => throw NqlParseException(s"unknown GRAPH algorithm $k")
    }
  }

  /** `FIND NODES|EDGES|ROWS|PATH …` (reference FindStmt, `ast.rs:753-793`;
    * grammar `parser.rs:1925-1992`): pattern, optional WHERE conds,
    * optional RETURN projection, optional LIMIT. */
  private def parseFind(p: P): Statement = {
    // label/type operand: bare ident (reference style) or quoted string
    def nameOperand(): String = {
      val t = p.next()
      if (t.startsWith("'")) t.substring(1, t.length - 1) else t
    }
    def maybeName(): Option[String] =
      if (!p.done && !Set("WHERE", "RETURN", "LIMIT").contains(p.peekUpper.get))
        Some(nameOperand())
      else None
    def retItems(): Seq[String] =
      if (p.accept("RETURN")) {
        val out = Seq.newBuilder[String]
        out += p.next()
        while (p.accept(",")) out += p.next()
        out.result()
      } else Nil
    p.peekUpper match {
      case Some("NODE") | Some("NODES") | Some("VERTEX") =>
        p.next()
        val label = maybeName()
        val conds = if (p.accept("WHERE")) parseConds(p) else Nil
        val ret = retItems()
        val limit = if (p.accept("LIMIT")) Some(p.int()) else None
        if (!p.done) throw NqlParseException(
          "FIND NODES takes [label] [WHERE ...] [RETURN cols] [LIMIT n]")
        FindNodes(label, conds, ret, limit)
      case Some("EDGE") | Some("EDGES") =>
        p.next()
        val etype = maybeName()
        val conds = if (p.accept("WHERE")) parseConds(p) else Nil
        val ret = retItems()
        val limit = if (p.accept("LIMIT")) Some(p.int()) else None
        if (!p.done) throw NqlParseException(
          "FIND EDGES takes [type] [WHERE ...] [RETURN cols] [LIMIT n]")
        FindEdges(etype, conds, ret, limit)
      case Some("PATH") =>
        p.next()
        val from = if (p.accept("FROM")) Some(p.stringLit()) else None
        val via = if (p.accept("VIA")) Some(p.stringLit()) else None
        val to = if (p.accept("TO")) Some(p.stringLit()) else None
        val limit = if (p.accept("LIMIT")) Some(p.int()) else None
        if (from.isEmpty && to.isEmpty)
          throw NqlParseException("FIND PATH requires FROM and/or TO")
        if (!p.done) throw NqlParseException(
          "FIND PATH takes [FROM 'key'] [VIA 'etype'] [TO 'key'] [LIMIT n]")
        FindPath(from, via, to, limit)
      case Some("ROWS") =>
        p.next()
        p.accept("FROM") // reference writes FIND ROWS FROM t; bare t also accepted
        val target = p.next()
        val conds = if (p.accept("WHERE")) parseConds(p) else Nil
        val ret = retItems()
        val limit = if (p.accept("LIMIT")) Some(p.int()) else None
        Find(target, conds, limit, ret)
      // reference default: any other FIND (bare, or straight into
      // WHERE/RETURN/LIMIT) is a node search with no label
      // (`parser.rs:1959-1961` FindPattern::Nodes { label: None })
      case Some("WHERE") | Some("RETURN") | Some("LIMIT") | None =>
        val conds = if (p.accept("WHERE")) parseConds(p) else Nil
        val ret = retItems()
        val limit = if (p.accept("LIMIT")) Some(p.int()) else None
        if (!p.done) throw NqlParseException(
          "FIND takes [WHERE ...] [RETURN cols] [LIMIT n]")
        FindNodes(None, conds, ret, limit)
      case other => throw NqlParseException(
        s"FIND expects NODES, EDGES, ROWS or PATH, got ${other.getOrElse("<end>")}")
    }
  }

  /** `ASOF '<leftType>' TO '<rightType>' ON <key> AT <ts>` */
  private def parseAsof(p: P): AsofJoin = {
    val l = p.stringLit(); p.expectKw("TO"); val r = p.stringLit()
    p.expectKw("ON"); val key = p.next()
    p.expectKw("AT"); val ts = p.next()
    AsofJoin(l, r, key, ts)
  }

  /** `SAMPLE <table> RATE <pct> KEY <col>` */
  private def parseSample(p: P): Sample = {
    val t = p.next()
    p.expectKw("RATE"); val rate = p.int()
    if (rate < 0 || rate > 100) throw NqlParseException(s"RATE must be 0..100, got $rate")
    p.expectKw("KEY"); val key = p.next()
    Sample(t, rate, key)
  }

  /** `DEDUP <table> BY <col> KEY <col>` or `DEDUP AGAINST '<source>'` */
  private def parseDedup(p: P): Statement = {
    if (p.accept("AGAINST")) {
      val src = p.stringLit()
      if (!p.done) throw NqlParseException("DEDUP AGAINST takes only the corpus source")
      return DedupAgainst(src)
    }
    val t = p.next()
    p.expectKw("BY"); val by = p.next()
    p.expectKw("KEY"); val key = p.next()
    Dedup(t, by, key)
  }

  /** `ident op literal (AND ident op literal)*` — the condition surface the
    * reference executes (`query_router/src/lib.rs:5769-5820`: binary
    * compares joined by AND; richer predicates go through SQL passthrough).
    */
  /** `CONSTRAINT CREATE <name> ON NODE [label]|EDGE [type] PROPERTY <p>
    * UNIQUE|EXISTS|TYPE <t>` / DROP / LIST / GET / CHECK (reference
    * grammar `parser.rs:2701-2800`; CHECK is our validate-on-scan
    * extension — see [[ConstraintCheck]]). */
  private def parseConstraint(p: P): Statement = {
    def nameTok(): String = {
      val t = p.next()
      if (t.startsWith("'")) t.substring(1, t.length - 1) else t
    }
    p.next().toUpperCase match {
      case "CREATE" =>
        val name = nameTok()
        p.expectKw("ON")
        val onEdges = p.next().toUpperCase match {
          case "NODE" => false
          case "EDGE" => true
          case k => throw NqlParseException(s"CONSTRAINT CREATE expects ON NODE or ON EDGE, got $k")
        }
        val filter = if (!p.peekUpper.contains("PROPERTY")) Some(nameTok()) else None
        p.expectKw("PROPERTY")
        val prop = nameTok()
        val (ctype, typeName) = p.next().toUpperCase match {
          case "UNIQUE" => ("unique", None)
          case "EXISTS" => ("exists", None)
          case "TYPE" => ("type", Some(nameTok()))
          case k => throw NqlParseException(s"expected UNIQUE, EXISTS, or TYPE, got $k")
        }
        if (!p.done) throw NqlParseException(
          "CONSTRAINT CREATE takes <name> ON NODE [label]|EDGE [type] PROPERTY <p> UNIQUE|EXISTS|TYPE <t>")
        ConstraintCreate(name, onEdges, filter, prop, ctype, typeName)
      case "DROP" => ConstraintDrop(nameTok())
      case "LIST" =>
        if (!p.done) throw NqlParseException("CONSTRAINT LIST takes no arguments")
        ConstraintList()
      case "GET" => ConstraintGet(nameTok())
      case "CHECK" => ConstraintCheck(nameTok())
      case k => throw NqlParseException(
        s"CONSTRAINT expects CREATE, DROP, LIST, GET, or CHECK, got $k")
    }
  }

  /** AND-chained conditions. Comparison ops plus the reference's vector
    * metadata-filter forms (`vector_engine/src/lib.rs:297-324`):
    * `col IN (v, …)`, `col CONTAINS 'x'`, `col STARTSWITH 'x'` (also
    * `STARTS WITH`), `col EXISTS`. OR is not in this grammar (the
    * reference's richer boolean trees stay on the SQL/Cypher side). */
  private def parseConds(p: P): Seq[Cond] = {
    def literal(raw: String): Any =
      if (raw.startsWith("'")) raw.substring(1, raw.length - 1)
      else if (raw.equalsIgnoreCase("true")) true
      else if (raw.equalsIgnoreCase("false")) false
      else try { if (raw.contains('.')) raw.toDouble else raw.toLong }
      catch {
        case _: NumberFormatException =>
          throw NqlParseException(s"expected a literal, got $raw")
      }
    val out = Seq.newBuilder[Cond]
    var continue = true
    while (continue) {
      val colName = p.next()
      p.peekUpper match {
        case Some("IN") =>
          p.next(); p.expectKw("(")
          val vs = Seq.newBuilder[Any]
          var go = true
          while (go) { vs += literal(p.next()); go = p.accept(",") }
          p.expectKw(")")
          out += Cond(colName, "in", vs.result())
        case Some("CONTAINS") =>
          p.next(); out += Cond(colName, "contains", p.stringLit())
        case Some("STARTSWITH") =>
          p.next(); out += Cond(colName, "startswith", p.stringLit())
        case Some("STARTS") =>
          p.next(); p.expectKw("WITH")
          out += Cond(colName, "startswith", p.stringLit())
        case Some("EXISTS") =>
          p.next(); out += Cond(colName, "exists", null)
        case _ =>
          val op = p.next() match {
            case "<>" => "!="
            case o @ ("=" | "!=" | "<" | "<=" | ">" | ">=") => o
            case o => throw NqlParseException(s"unsupported operator $o")
          }
          out += Cond(colName, op, literal(p.next()))
      }
      continue = p.accept("AND")
    }
    out.result()
  }
}
