package graft.relational

import graft.nql.{NqlExecException, NqlParseException, SqlDelete, SqlUpdate, Statement}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executable `UPDATE … SET … [WHERE …]` / `DELETE FROM … [WHERE …]` on
  * relational tables (reference `relational_engine/src/lib.rs:3842`
  * update / `lib.rs:3954` delete_rows; router dispatch
  * `query_router/src/lib.rs:1974-1975`), rebuilt as COPY-ON-WRITE: the
  * post-image is written to a fresh staging directory (new files only —
  * no in-place mutation), then swapped in for the table location and the
  * catalog refreshed. That is the lakehouse DML pattern that scales:
  * rewrite cost is proportional to the table (or, with partition-level
  * pruning in a real table format, to the touched partitions), readers
  * never observe a half-written file, and the swap is two directory
  * renames — metadata-sized, not data-sized.
  *
  * SET right-hand sides and WHERE predicates are full Catalyst SQL
  * expressions (`expr(...)`) — strictly more than the reference's
  * `Condition` + literal `Value` updates. All SET expressions evaluate
  * against the OLD row (standard SQL UPDATE semantics), so
  * `SET a = b, b = a` swaps.
  *
  * Targets must be catalog tables (e.g. created via `CREATE TABLE … AS
  * SELECT`). The sf parquet views (`lineitem`, …) are read-only driver
  * data — updating one raises a loud [[NqlExecException]] with the CTAS
  * guidance instead of silently rewriting shared input.
  */
object TableDml {

  /** Split `s` on top-level occurrences of `sep` (depth-0 w.r.t. parens,
    * outside single-quoted literals). */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur += c
        // SQL-style escaped quote '' stays inside the literal
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { cur += '\''; i += 1 }
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  private val updateRe = """(?is)^UPDATE\s+([A-Za-z_][A-Za-z0-9_.]*)\s+SET\s+(.+)$""".r
  private val deleteRe = """(?is)^DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\s+WHERE\s+(.+))?\s*$""".r

  /** Parse an UPDATE/DELETE statement string into its AST form. */
  def parse(sql: String): Statement = sql.trim.stripSuffix(";") match {
    case updateRe(table, tail) =>
      // WHERE splits off at the first top-level WHERE keyword of the tail
      // (WHERE is not an expression keyword, so a top-level WHERE inside a
      // SET right-hand side cannot occur in a valid statement).
      val padded = " " + tail + " "
      val parts = """(?i)\sWHERE\s""".r.findAllMatchIn(padded)
        .filter(m => topLevelAt(padded, m.start)).toSeq
      val (setClause, where) = parts.headOption match {
        case Some(m) =>
          (padded.substring(0, m.start).trim, Some(padded.substring(m.end).trim))
        case None => (tail.trim, None)
      }
      where.filter(_.isEmpty).foreach(_ =>
        throw NqlParseException("UPDATE: WHERE clause is empty"))
      val sets = splitTopLevel(setClause, ',').map { a =>
        val eq = firstTopLevelEq(a)
        if (eq < 0) throw NqlParseException(s"UPDATE SET expects col = expr, got: $a")
        val c = a.substring(0, eq).trim
        val e = a.substring(eq + 1).trim
        if (c.isEmpty || e.isEmpty)
          throw NqlParseException(s"UPDATE SET expects col = expr, got: $a")
        (c, e)
      }
      if (sets.isEmpty) throw NqlParseException("UPDATE needs at least one SET assignment")
      SqlUpdate(table, sets, where)
    case deleteRe(table, where) =>
      SqlDelete(table, Option(where).map(_.trim))
    case other =>
      throw NqlParseException(
        s"cannot parse DML statement (expected UPDATE t SET ... / DELETE FROM t ...): ${other.take(60)}")
  }

  /** Is position `i` in `s` at paren depth 0 and outside a string literal? */
  private def topLevelAt(s: String, at: Int): Boolean = {
    var depth = 0; var inStr = false; var i = 0
    while (i < at) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    depth == 0 && !inStr
  }

  /** Index of the first top-level bare `=` (not `<=`, `>=`, `!=`). */
  private def firstTopLevelEq(s: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '=' if depth == 0 &&
          (i == 0 || !"<>!".contains(s.charAt(i - 1))) => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def requireWritable(spark: SparkSession, table: String, op: String): Unit = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (cat.isTempView(Seq(table)) || !spark.catalog.tableExists(table))
      throw NqlExecException(
        s"$op targets '$table', which is not a writable catalog table — the sf parquet " +
          "views are read-only driver data. CREATE TABLE <name> AS SELECT ... first, " +
          "then run DML against the copy.")
    val _ = cat.getTableMetadata(ident) // loud if the catalog entry is broken
  }

  /** Copy-on-write rewrite: materialize `post` into a staging dir next to
    * the table location, swap directories, refresh. Returns nothing; the
    * table's next read sees the post-image. */
  private def rewrite(spark: SparkSession, table: String, post: DataFrame): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(loc.getParent, s".${loc.getName}.cow-$tag")
    val retired = new org.apache.hadoop.fs.Path(loc.getParent, s".${loc.getName}.old-$tag")
    post.write.format(meta.provider.getOrElse("parquet")).save(staging.toString)
    // Swap: two renames (metadata ops), then drop the pre-image files.
    // A real multi-writer deployment would do this swap inside a table
    // format's metadata commit (Delta/Iceberg); the file layout and cost
    // model here are the same.
    if (!fs.rename(loc, retired))
      throw NqlExecException(s"$table: could not retire current table directory $loc")
    if (!fs.rename(staging, loc)) {
      fs.rename(retired, loc) // best-effort rollback
      throw NqlExecException(s"$table: could not install new table directory")
    }
    fs.delete(retired, true)
    spark.sql(s"REFRESH TABLE $table")
  }

  private def affected(table: String, op: String, n: Long)(spark: SparkSession): DataFrame =
    spark.createDataFrame(Seq((table, op, n))).toDF("table", "operation", "rows_affected")

  /** Execute UPDATE: all SET expressions evaluated against the old row,
    * applied where the predicate holds. Returns (table, operation,
    * rows_affected) — the reference's `usize` count as a frame. */
  def update(spark: SparkSession, st: SqlUpdate): DataFrame = {
    requireWritable(spark, st.table, "UPDATE")
    val target = spark.table(st.table)
    val cols = target.columns
    st.sets.foreach { case (c, _) =>
      if (!cols.exists(_.equalsIgnoreCase(c)))
        throw NqlExecException(s"UPDATE ${st.table}: no such column '$c'")
    }
    val cond = st.where.map(expr).getOrElse(lit(true))
    // Stage every new value first so multi-column SETs all see OLD values.
    val staged = st.sets.zipWithIndex.map { case ((c, e), i) => (c, s"__new_$i", e) }
    var df = target
    staged.foreach { case (_, tmp, e) => df = df.withColumn(tmp, expr(e)) }
    df = df.withColumn("__hit", cond)
    val byLower = staged.map { case (c, tmp, _) => c.toLowerCase -> tmp }.toMap
    val post = df.select(cols.map { c =>
      byLower.get(c.toLowerCase) match {
        case Some(tmp) => when(col("__hit"), col(tmp)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    // Count the hits in the SAME pass family (pre-image scan); the rewrite
    // below is the second and last full read of the table.
    val n = target.filter(cond).count()
    rewrite(spark, st.table, post)
    affected(st.table, "update", n)(spark)
  }

  /** Execute DELETE: survivors are rows where the predicate is NOT true
    * (3VL: a NULL predicate row survives, matching SQL DELETE). */
  def delete(spark: SparkSession, st: SqlDelete): DataFrame = {
    requireWritable(spark, st.table, "DELETE")
    val target = spark.table(st.table)
    val n = st.where match {
      case Some(w) =>
        val cond = expr(w)
        val n0 = target.filter(cond).count()
        rewrite(spark, st.table, target.filter(!coalesce(cond, lit(false))))
        n0
      case None =>
        val n0 = target.count()
        rewrite(spark, st.table, target.limit(0))
        n0
    }
    affected(st.table, "delete", n)(spark)
  }
}
