package graft

import org.apache.spark.sql.SparkSession

/** Minimal NQL shell (the Spark analogue of the reference's
  * `neumann_shell` REPL): executes each argument — or each stdin line —
  * as one NQL statement against SPARK_GRAFT_SF_DIR and prints the result.
  *
  *   sbt 'runMain graft.Shell "SIMILAR '"'"'vec:0'"'"' LIMIT 5"'
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    val storeDir = sys.env.getOrElse("SPARK_GRAFT_STORE_DIR",
      java.nio.file.Files.createTempDirectory("graft-shell-store").toString)
    val store = new graft.unified.EntityStore(spark, storeDir)
    val statements =
      if (args.nonEmpty) args.toSeq
      else scala.io.Source.stdin.getLines().filter(_.trim.nonEmpty).toSeq
    statements.foreach { q =>
      println(s"nql> $q")
      try graft.nql.Nql.execute(spark, sfDir, store, q).show(20, truncate = false)
      catch { case e: Exception => println(s"error: ${e.getMessage}") }
    }
    spark.stop()
  }
}
