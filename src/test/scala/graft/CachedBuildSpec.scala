package graft

import java.nio.file.Files

/** `SparkEntry.cachedBuild` — the build-once, copy-per-run scaffolding
  * cache behind the heavy lifecycle bench entries (p9/p10/q64d). The
  * r18 hardening these specs pin:
  *
  *  - the source-data fingerprint recurses ONE level into table
  *    subdirectories, so an in-place part-file rewrite under an
  *    unchanged table dir still invalidates the cache (a stale
  *    deployment would silently serve the old corpus against oracles
  *    over the new);
  *  - a COMPLETE cache is reused without re-running the builder, and
  *    every invocation gets its OWN work copy (UUID-suffixed), so
  *    concurrent runs never share or delete each other's directory;
  *  - markerless debris squatting on the cache path (a torn copy) is
  *    displaced without ever deleting the path in place, and the run
  *    still serves a complete deployment.
  */
class CachedBuildSpec extends SparkSpec {

  private def write(path: java.io.File, text: String): Unit = {
    path.getParentFile.mkdirs()
    Files.write(path.toPath, text.getBytes("UTF-8"))
  }

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete()
  }

  /** Fresh source-data dir shaped like a testdata sf dir: one table
    * SUBDIRECTORY holding a part file (the case the one-level
    * fingerprint recursion exists for). */
  private def mkSource(): java.io.File = {
    val src = Files.createTempDirectory("graft-cbs-src").toFile
    write(new java.io.File(src, "tbl.parquet/part-00000"), "v1 contents")
    src
  }

  test("complete cache is reused (builder runs once); each invocation " +
      "gets its own work copy") {
    val src = mkSource()
    val kind = s"cbspec1_${System.nanoTime()}"
    try {
      var builds = 0
      def run(): String = SparkEntry.cachedBuild(spark, kind,
        src.toString) { out =>
        builds += 1
        write(new java.io.File(out, "artifact"), s"build $builds")
      }
      val w1 = run()
      val w2 = run()
      assert(builds == 1, "second invocation must serve from the cache")
      assert(w1 != w2, "work copies must be per-run (UUID-suffixed), " +
        "never a shared path a concurrent JVM could delete")
      assert(new java.io.File(w1, "artifact").exists())
      assert(new java.io.File(w2, "artifact").exists())
      // deleting one run's copy must not touch the other's (the exact
      // concurrent-bench failure the shared work dir had)
      rmrf(new java.io.File(w1))
      assert(new java.io.File(w2, "artifact").exists())
    } finally rmrf(src)
  }

  test("fingerprint recurses into table subdirectories: an in-place " +
      "part-file rewrite invalidates the cache") {
    val src = mkSource()
    val kind = s"cbspec2_${System.nanoTime()}"
    try {
      var builds = 0
      def run(): String = SparkEntry.cachedBuild(spark, kind,
        src.toString) { out =>
        builds += 1
        write(new java.io.File(out, "artifact"), s"build $builds")
      }
      run()
      assert(builds == 1)
      // regenerate the part file IN PLACE: same table-dir entry, new
      // content length (the top-level-only fingerprint missed this)
      write(new java.io.File(src, "tbl.parquet/part-00000"),
        "v2 contents, longer than before")
      val w = run()
      assert(builds == 2, "an in-place table rewrite must miss the cache")
      assert(Files.readString(new java.io.File(w, "artifact").toPath)
        == "build 2")
    } finally rmrf(src)
  }

  test("two concurrent builders race an empty cache: both runs get a " +
      "complete work copy, one winner publishes, no nested duplicate") {
    val src = mkSource()
    val kind = s"cbspec4_${System.nanoTime()}"
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      def run(): String = SparkEntry.cachedBuild(spark, kind,
        src.toString) { out =>
        builds.incrementAndGet()
        Thread.sleep(300) // widen the publish window
        write(new java.io.File(out, "artifact"), "deterministic content")
      }
      val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var failure: Option[Throwable] = None
      val threads = (1 to 2).map(_ => new Thread(() =>
        try results.add(run())
        catch { case t: Throwable => failure = Some(t) }))
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(failure.isEmpty, s"concurrent builder failed: $failure")
      val works = results.toArray(Array.empty[String]).toSeq
      assert(works.size == 2 && works.distinct.size == 2)
      works.foreach { w =>
        assert(Files.readString(new java.io.File(w, "artifact").toPath)
          == "deterministic content", s"incomplete work copy at $w")
      }
      // exactly one healthy published cache, marker at ROOT, and no
      // nested *.build-* duplicate (the LocalFileSystem rename-onto-
      // existing fallback this publish protocol exists to prevent)
      val tmp = System.getProperty("java.io.tmpdir")
      val caches = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith(s"graft_cache_${kind}_") &&
          !f.getName.contains(".build-") && !f.getName.contains(".aside-"))
      assert(caches.length == 1)
      assert(new java.io.File(caches.head, "_BUILD_COMPLETE").exists())
      assert(!caches.head.listFiles().exists(_.getName.contains(".build-")),
        "publish nested a duplicate deployment inside the cache")
    } finally rmrf(src)
  }

  test("markerless debris on the cache path is displaced, never blocks " +
      "the run, and a complete deployment is served") {
    val src = mkSource()
    val kind = s"cbspec3_${System.nanoTime()}"
    try {
      var builds = 0
      def run(): String = SparkEntry.cachedBuild(spark, kind,
        src.toString) { out =>
        builds += 1
        write(new java.io.File(out, "artifact"), s"build $builds")
      }
      // discover the cache path by building once, then corrupt it:
      // strip the completion marker and plant stale content — the
      // shape a torn legacy copy leaves behind
      val w1 = run()
      val tmp = System.getProperty("java.io.tmpdir")
      val cache = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith(s"graft_cache_${kind}_") &&
          !f.getName.contains(".build-") && !f.getName.contains(".aside-"))
      assert(cache.length == 1, s"expected one cache dir, got " +
        cache.map(_.getName).mkString(", "))
      new java.io.File(cache.head, "_BUILD_COMPLETE").delete()
      write(new java.io.File(cache.head, "artifact"), "torn debris")
      val w2 = run()
      assert(builds == 2, "a markerless cache is debris: rebuild")
      assert(Files.readString(new java.io.File(w2, "artifact").toPath)
        == "build 2", "the run must serve the fresh build, not debris")
      // and the slot is healthy again: a third run reuses it
      run()
      assert(builds == 2)
      assert(new java.io.File(w1, "artifact").exists(),
        "displacing debris must not touch earlier work copies")
    } finally rmrf(src)
  }
}
