package graft.relational

import graft.nql.{NqlExecException, NqlParseException, SqlDelete, SqlUpdate, Statement}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executable `UPDATE … SET … [WHERE …]` / `DELETE FROM … [WHERE …]` on
  * relational tables (reference `relational_engine/src/lib.rs:3842`
  * update / `lib.rs:3954` delete_rows; router dispatch
  * `query_router/src/lib.rs:1974-1975`), rebuilt as COPY-ON-WRITE: the
  * post-image is written to a fresh staging directory (new files only —
  * no in-place mutation), then installed — for an UNPARTITIONED table by
  * a two-rename directory swap; for a PARTITIONED table by dynamic
  * partition overwrite of ONLY the partitions that contain affected rows
  * ([[rewriteTouchedPartitions]]): untouched partitions are neither read
  * for the rewrite nor written. That is the lakehouse DML pattern that
  * scales: at 100 TB a predicate that prunes to k partitions costs
  * O(k·partition), not O(table); readers never observe a half-written
  * file; the install step is metadata-sized. Unconditional DELETE is a
  * TRUNCATE (pure metadata), and a zero-hit UPDATE/DELETE writes
  * nothing.
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

  private def tableMeta(spark: SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))

  /** Hive-style partition spec for one partition-values row:
    * `team='ml', year='2024'`. */
  private def specOf(partCols: Seq[String], r: org.apache.spark.sql.Row): String =
    partCols.zipWithIndex.map { case (c, i) =>
      s"$c='${String.valueOf(r.get(i)).replace("'", "''")}'"
    }.mkString(", ")

  /** Drop the given partitions from catalog AND disk. On a MANAGED table
    * `ALTER TABLE … DROP PARTITION` removes the data too; on an EXTERNAL
    * table it removes only catalog metadata — the partition directory
    * stays on disk, and a later INSERT into the same partition value
    * re-registers the partition OVER the old directory, resurrecting the
    * supposedly deleted rows (plus a silent disk leak). So for
    * non-MANAGED tables each dropped partition's physical location is
    * captured from the catalog BEFORE the drop and deleted explicitly —
    * mirroring what [[rewrite]] does for the unpartitioned external
    * case. */
  private def dropPartitions(spark: SparkSession, table: String,
      partCols: Seq[String], rows: Seq[org.apache.spark.sql.Row]): Unit = {
    if (rows.isEmpty) return
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val managed = cat.getTableMetadata(ident).tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED
    // capture external partitions' physical locations BEFORE the drop
    val locs =
      if (managed) Seq.empty
      else rows.flatMap { r =>
        val specMap = partCols.zipWithIndex.map { case (c, i) =>
          c -> String.valueOf(r.get(i))
        }.toMap
        scala.util.Try(cat.getPartition(ident, specMap)).toOption
          .map(p => new org.apache.hadoop.fs.Path(p.location))
      }
    // ONE catalog statement for the whole batch — a 10k-partition
    // unconditional DELETE is one metadata commit, not 10k round-trips
    val specs = rows.map(r => s"PARTITION (${specOf(partCols, r)})").mkString(", ")
    spark.sql(s"ALTER TABLE $table DROP IF EXISTS $specs")
    locs.foreach { p =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  /** PARTITION-PRUNED copy-on-write — the 100 TB DML path: only the
    * partitions that contain affected rows are rewritten; every other
    * partition's files are untouched (zero read, zero write). The
    * post-image of the touched partitions stages to a scratch dir, then
    * lands via dynamic partition overwrite (per-partition swap inside
    * `InsertIntoHadoopFsRelation` — partitions absent from the staged
    * data are left alone). Partitions a DELETE empties entirely are
    * dropped explicitly afterwards (dynamic overwrite cannot clear a
    * partition it writes no rows for). */
  private def rewriteTouchedPartitions(spark: SparkSession, table: String,
      partCols: Seq[String], touched: Array[org.apache.spark.sql.Row],
      postTouched: DataFrame): Unit = {
    val meta = tableMeta(spark, table)
    val provider = meta.provider.getOrElse("parquet")
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(loc.getParent, s".${loc.getName}.cow-$tag")
    // joins reorder columns (join keys first) — restore the table's
    // schema order, since insertInto resolves POSITIONALLY
    val tableCols = spark.table(table).columns
    postTouched.select(tableCols.map(col): _*)
      .write.format(provider).save(staging.toString)
    val back = spark.read.format(provider).load(staging.toString)
      .select(tableCols.map(col): _*)
    // Write-scoped dynamic overwrite: `insertInto` on a catalog table does
    // not honor DataFrameWriter's per-write partitionOverwriteMode option,
    // so the mode is set on a CLONED session (shared external catalog,
    // private runtime conf). No concurrent query in the caller's session
    // can ever observe the temporary setting.
    val writer = spark.newSession()
    writer.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    writer.read.format(provider).load(staging.toString)
      .select(tableCols.map(col): _*)
      .write.mode("overwrite").insertInto(table)
    val written = back.select(partCols.map(col): _*).distinct()
      .collect().map(specOf(partCols, _)).toSet
    dropPartitions(spark, table, partCols,
      touched.filterNot(r => written(specOf(partCols, r))).toSeq)
    fs.delete(staging, true)
    spark.sql(s"REFRESH TABLE $table")
  }

  /** Partition-MIGRATION rewrite (UPDATE with SET on a partition column):
    * the whole-table post-image lands via ONE atomic directory swap, not
    * per-partition dynamic overwrite. Two reasons. (1) A migration
    * rewrites every partition anyway (update() passes allParts), so
    * there is no pruning for the dynamic path to exploit. (2) The
    * dynamic path commits per partition and drops the emptied partitions
    * only afterwards — a concurrent reader in that window sees migrated
    * rows in their NEW partition while the pre-image still sits in the
    * old one: duplicated data, silently. With the swap a reader sees the
    * complete pre-image, the complete post-image, or (inside the short
    * catalog-sync instants) a missing-path ERROR — never torn or
    * duplicated rows (spec-pinned in DdlDmlSpec).
    *
    * Catalog-sync ordering makes every intermediate state safe:
    * partitions NEW in the post-image are ADDed before the swap (their
    * rows don't exist yet, so pre-swap reads stay exactly the
    * pre-image), and entries the migration empties are DROPped after it
    * (their dirs are gone, so a read in between errors rather than
    * returning stale rows). Surviving partitions keep their absolute
    * locations under the table root, which the rename swap repopulates
    * in place. A custom-LOCATION partition (dir outside the table root)
    * is re-pointed at the standard layout (drop + re-add) and its old
    * dir deleted — same external-dir hygiene as [[dropPartitions]]. */
  private def rewritePartitionedSwap(spark: SparkSession, table: String,
      partCols: Seq[String], preParts: Array[org.apache.spark.sql.Row],
      post: DataFrame): Unit = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = cat.getTableMetadata(ident)
    val provider = meta.provider.getOrElse("parquet")
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(loc.getParent, s".${loc.getName}.cow-$tag")
    val retired = new org.apache.hadoop.fs.Path(loc.getParent, s".${loc.getName}.old-$tag")
    val tableCols = spark.table(table).columns
    post.select(tableCols.map(col): _*)
      .write.format(provider).partitionBy(partCols: _*).save(staging.toString)
    // the specs that actually landed (read back from staging, so adds and
    // drops are derived from what is on disk, not from a re-evaluated
    // plan). Partition-type inference must be OFF for this read: a STRING
    // partition value that merely looks numeric ('00123') would be
    // re-typed (int 123), its spec string would no longer match the
    // table-typed pre-image spec, and adds/stales would be miscomputed —
    // the real post-swap directory never registered, the correct entry
    // dropped as stale. Read raw strings in a conf-cloned session, then
    // cast to the TABLE's partition schema so pre/post specs compare in
    // table-typed space.
    val noInfer = spark.newSession()
    noInfer.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val partSchema = meta.partitionSchema
    val postSpecs = noInfer.read.format(provider).load(staging.toString)
      .select(partCols.map(c => col(c).cast(partSchema(c).dataType).as(c)): _*)
      .distinct().collect()
    val preSpecSet = preParts.map(specOf(partCols, _)).toSet
    val postSpecSet = postSpecs.map(specOf(partCols, _)).toSet
    val added = postSpecs.filterNot(r => preSpecSet(specOf(partCols, r)))
    val qualifiedLoc = fs.makeQualified(loc).toString
    val customPre = preParts.flatMap { r =>
      val specMap = partCols.zipWithIndex.map { case (c, i) =>
        c -> String.valueOf(r.get(i))
      }.toMap
      scala.util.Try(cat.getPartition(ident, specMap)).toOption
        .map(p => (r, fs.makeQualified(new org.apache.hadoop.fs.Path(p.location))))
        .filterNot { case (_, p) =>
          p.toString == qualifiedLoc || p.toString.startsWith(qualifiedLoc + "/")
        }
    }
    val stale = preParts.filter { r =>
      val s = specOf(partCols, r)
      !postSpecSet(s) || customPre.exists { case (cr, _) => specOf(partCols, cr) == s }
    }
    // on any failed swap the rollback must also UNregister the `added`
    // partitions: they were registered before the swap and point at
    // directories that only exist in the (never-installed) post-image —
    // leaving them would error every subsequent read of the table
    def dropAddedOnRollback(): Unit = if (added.nonEmpty)
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS " +
        added.map(r => s"PARTITION (${specOf(partCols, r)})").mkString(", "))
    if (added.nonEmpty)
      spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS " +
        added.map(r => s"PARTITION (${specOf(partCols, r)})").mkString(" "))
    if (!fs.rename(loc, retired)) {
      dropAddedOnRollback()
      throw NqlExecException(s"$table: could not retire current table directory $loc")
    }
    if (!fs.rename(staging, loc)) {
      fs.rename(retired, loc) // best-effort rollback
      dropAddedOnRollback()
      throw NqlExecException(s"$table: could not install new table directory")
    }
    if (stale.nonEmpty)
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS " +
        stale.map(r => s"PARTITION (${specOf(partCols, r)})").mkString(", "))
    // re-register custom-located SURVIVORS at the standard in-root layout
    val customSurvivors = customPre.map(_._1).filter(r => postSpecSet(specOf(partCols, r)))
    if (customSurvivors.nonEmpty)
      spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS " +
        customSurvivors.map(r => s"PARTITION (${specOf(partCols, r)})").mkString(" "))
    customPre.foreach { case (_, p) => fs.delete(p, true) }
    fs.delete(retired, true)
    spark.sql(s"REFRESH TABLE $table")
  }

  /** Touched-partition discovery: the distinct partition tuples holding
    * rows that satisfy `cond`. Collect is bounded by the table's
    * partition COUNT (metadata-scale), never by row count; partition
    * predicates in `cond` prune the discovery scan itself. */
  private def touchedPartitions(target: DataFrame, partCols: Seq[String],
      cond: org.apache.spark.sql.Column, table: String) = {
    val df = target.filter(cond).select(partCols.map(col): _*).distinct()
    val rows = df.collect()
    if (rows.exists(_.anyNull)) throw NqlExecException(
      s"$table: DML over rows in a null partition is not supported — " +
        "backfill the partition column first")
    (df, rows)
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
    // below is the second and last read of the table (touched partitions
    // only, when the table is partitioned).
    val n = target.filter(cond).count()
    if (n == 0) return affected(st.table, "update", 0)(spark) // no hits → no write at all
    val pCols = tableMeta(spark, st.table).partitionColumnNames
    if (pCols.isEmpty) rewrite(spark, st.table, post)
    else if (st.sets.exists { case (c, _) => pCols.exists(_.equalsIgnoreCase(c)) }) {
      // a SET on a partition column migrates rows between partitions:
      // the post-image of EVERY current partition must land, so this is
      // a whole-table rewrite — done as ONE atomic directory swap (see
      // rewritePartitionedSwap: the per-partition dynamic-overwrite path
      // would expose duplicated rows to concurrent readers between the
      // overwrite commit and the emptied-partition drop). No
      // touched-partition discovery here — it would be an unused scan.
      val allParts = target.select(pCols.map(col): _*).distinct().collect()
      if (allParts.exists(_.anyNull)) throw NqlExecException(
        s"${st.table}: DML over rows in a null partition is not supported")
      // POST-image guard: a SET that writes NULL into a partition column
      // would silently land rows in __HIVE_DEFAULT_PARTITION__, which
      // later DML on the table would then reject — fail loudly up front
      val postParts = post.select(pCols.map(col): _*).distinct().collect()
      if (postParts.exists(_.anyNull)) throw NqlExecException(
        s"${st.table}: UPDATE would write NULL into partition column(s) " +
          s"${pCols.mkString(", ")} — rows in a null partition are not supported")
      rewritePartitionedSwap(spark, st.table, pCols, allParts, post)
    } else {
      // partition-pruned: rewrite only partitions holding hit rows
      val (touchedDf, touchedRows) = touchedPartitions(target, pCols, cond, st.table)
      val postTouched = post.join(broadcast(touchedDf), pCols, "left_semi")
      rewriteTouchedPartitions(spark, st.table, pCols, touchedRows, postTouched)
    }
    affected(st.table, "update", n)(spark)
  }

  /** Execute DELETE: survivors are rows where the predicate is NOT true
    * (3VL: a NULL predicate row survives, matching SQL DELETE). On a
    * partitioned table only the partitions containing deleted rows are
    * rewritten; unconditional DELETE is a TRUNCATE (metadata-only). */
  def delete(spark: SparkSession, st: SqlDelete): DataFrame = {
    requireWritable(spark, st.table, "DELETE")
    val target = spark.table(st.table)
    val n = st.where match {
      case Some(w) =>
        val cond = expr(w)
        val n0 = target.filter(cond).count()
        if (n0 > 0) {
          val pCols = tableMeta(spark, st.table).partitionColumnNames
          val survivors = target.filter(!coalesce(cond, lit(false)))
          if (pCols.isEmpty) rewrite(spark, st.table, survivors)
          else {
            val (touchedDf, touchedRows) = touchedPartitions(target, pCols, cond, st.table)
            rewriteTouchedPartitions(spark, st.table, pCols, touchedRows,
              survivors.join(broadcast(touchedDf), pCols, "left_semi"))
          }
        }
        n0
      case None =>
        val n0 = target.count()
        if (n0 > 0) {
          val meta = tableMeta(spark, st.table)
          val pCols = meta.partitionColumnNames
          if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
            spark.sql(s"TRUNCATE TABLE ${st.table}") // pure metadata
          else if (pCols.isEmpty)
            rewrite(spark, st.table, target.limit(0)) // external: swap in an empty dir
          else {
            // external partitioned: drop every partition (metadata +
            // per-partition dir removal — no data rewrite)
            dropPartitions(spark, st.table, pCols,
              target.select(pCols.map(col): _*).distinct().collect().toIndexedSeq)
            spark.sql(s"REFRESH TABLE ${st.table}")
          }
        }
        n0
    }
    affected(st.table, "delete", n)(spark)
  }
}
