package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Layouts

/** Dev-only stress rig for the maintained-layout snapshot contract:
  * a tight reader loop (count via the production read path) races an
  * incremental recluster, logging the PLANNED file list (df.inputFiles)
  * beside every count so a silent hole can be attributed to either the
  * snapshot listing, the DataFrame planning, or task execution. */
object ZSnapStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val trials = args.headOption.map(_.toInt).getOrElse(20)
    var failed = 0
    (1 to trials).foreach { trial =>
      val base = java.nio.file.Files.createTempDirectory("zstress").toString
      val lay = s"$base/lay"
      val slice = spark.range(0, 3000).select(
        col("id").as("a"), (col("id") % 100).as("b"), col("id").as("p"))
      Layouts.writeZOrderedMaintained(slice, lay, Seq("a", "b"),
        maxRecordsPerFile = 100L)
      val tail = spark.range(0, 400).select(
        (col("id") + 700).as("a"), (col("id") % 100).as("b"),
        (col("id") + 100000).as("p"))
      Layouts.appendZOrdered(tail, lay)
      @volatile var stop = false
      @volatile var bad: Option[String] = None
      val reader = new Thread(() => {
        try {
          while (!stop && bad.isEmpty) {
            Layouts.withMaintainedRead(spark, lay, attempts = 8) { df =>
              val planned = df.inputFiles
              val c = df.count()
              if (c < 3000 || c > 3400)
                bad = Some(s"count=$c planned=${planned.length} files: " +
                  planned.map(_.split('/').last).sorted.mkString(","))
              c
            }
          }
        } catch { case t: Throwable => bad = Some(s"reader threw: $t") }
      })
      reader.start()
      Layouts.reclusterZOrderedIncremental(spark, lay)
      stop = true
      reader.join(60000)
      bad.foreach { b => failed += 1; println(s"TRIAL $trial BAD: $b") }
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    println(s"done: $failed/$trials bad")
    spark.stop()
  }
}
