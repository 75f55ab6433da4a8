package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway experiment: decompose knnGraphIndexed vs knnGraphAuto. */
object KnnProbeTmp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10_emb")
    val layout = args.lift(1).getOrElse("/tmp/graft_annscale10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobTimes =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobs.put(js.jobId, (js.time, site))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val v = jobs.remove(je.jobId)
          if (v != null) jobTimes.add((je.time - v._1, v._2))
        }
      })
    def t[A](l: String)(f: => A): A = {
      jobTimes.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"$l%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      Thread.sleep(150)
      val it = jobTimes.iterator()
      val b = Seq.newBuilder[(Long, String)]
      while (it.hasNext) b += it.next()
      b.result().sortBy(-_._1).take(12).foreach { case (ms, site) =>
        println(f"      $ms%6d ms  $site%s")
      }
      r
    }
    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val S = graft.operators.Similarity
    args.lift(2).getOrElse("indexed") match {
      case "indexed" => t("knnGraphIndexed") {
        S.knnGraphIndexed(spark, layout, k = 5, nprobe = 2).count()
      }
      case "auto" => t("knnGraphAuto") {
        S.knnGraphAuto(emb, "vec_id", "embedding", k = 5, nprobe = 2).count()
      }
    }
    spark.stop()
  }
}
