package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** Driver-side parquet I/O for the lifecycle families' SMALL metadata
  * tables (index params, z-order generation records, manifests, batch
  * ledgers): the same standard parquet files Spark wrote and reads —
  * byte-compatible schemas, hidden-temp + atomic-rename publish — but
  * read and written with parquet-java directly on the driver.
  *
  * WHY (r19, guide §1.2 "the distributed algorithm first"): every
  * `spark.read.parquet(meta).head()/collect()` and every
  * `Seq(...).toDF.coalesce(1).write.parquet(meta)` of a KB-sized table
  * is a full Spark action — data-source resolution, planning, a
  * scheduled task, commit protocol — measured at ~100-150 ms each on a
  * quiet local[32] driver, and the lifecycle entries run 5-20 of them
  * per operation (q64c spent ~2 s of its 7 s wall in metadata actions
  * alone). Metadata work should be metadata ops (the same argument the
  * epoch fence and the membership registry already apply); Spark jobs
  * are for data. At cluster scale the win is larger, not smaller: each
  * such action is a driver→executor round trip.
  *
  * Readers tolerate every file a previous round's Spark writer
  * produced (optional/required primitives, 3-level string lists);
  * writers emit the SAME logical schema Spark's writer used (optional
  * fields, UTF8-annotated binary, 3-level lists) so Spark, DuckDB and
  * older readers see an identical table.
  */
object MetaIO {

  /** Column type tags for [[writeTable]] — the closed set the metadata
    * tables use. */
  sealed trait MT
  case object MString extends MT
  case object MInt extends MT
  case object MLong extends MT
  case object MDouble extends MT
  case object MBoolean extends MT
  case object MStringList extends MT
  /** `array<array<float>>` — the IVF quantizer matrices (centroids,
    * PQ codebooks). Encoded exactly as Spark writes nested lists
    * (3-level LIST whose element is itself a 3-level LIST of float). */
  case object MFloatMatrix extends MT

  private def schemaOf(cols: Seq[(String, MT)], msgName: String): MessageType = {
    val b = Types.buildMessage()
    cols.foreach { case (n, t) =>
      t match {
        case MString =>
          b.addField(Types.optional(BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(n))
        case MInt => b.addField(Types.optional(INT32).named(n))
        case MLong => b.addField(Types.optional(INT64).named(n))
        case MDouble => b.addField(Types.optional(DOUBLE).named(n))
        case MBoolean => b.addField(Types.optional(BOOLEAN).named(n))
        case MStringList =>
          // Spark's (non-legacy) 3-level list encoding:
          // optional group n (LIST) { repeated group list {
          //   optional binary element (STRING) } }
          b.addField(Types.optionalList()
            .element(Types.optional(BINARY)
              .as(LogicalTypeAnnotation.stringType()).named("element"))
            .named(n))
        case MFloatMatrix =>
          b.addField(Types.optionalList()
            .element(Types.optionalList()
              .element(Types.optional(FLOAT).named("element"))
              .named("element"))
            .named(n))
      }
    }
    b.named(msgName)
  }

  /** Write `rows` as ONE parquet file under `dir` with OVERWRITE
    * semantics and crash-atomic publish: the file is written to a
    * dot-prefixed temp name inside `dir` (hidden from every parquet
    * reader), the previous visible files are deleted, and the temp is
    * renamed into place (same-directory metadata op). A crash leaves
    * either the old table, or the old table plus a hidden temp —
    * never a half-written or doubled table. Callers that need a
    * multi-table atomic swap (generation records, manifests) keep
    * their existing write-to-tmp-DIR + rename-dir protocol and call
    * this for each member table inside the tmp dir. */
  def writeTable(conf: Configuration, dir: String, cols: Seq[(String, MT)],
                 rows: Seq[Seq[Any]]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val schema = schemaOf(cols, "graft_meta")
    val name = s"part-00000-${java.util.UUID.randomUUID()}.parquet"
    val tmp = new Path(d, s".$name.tmp")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(tmp, conf))
      .withType(schema).withConf(conf).build()
    try writeRows(writer, new SimpleGroupFactory(schema), cols, rows)
    finally writer.close()
    // overwrite: drop previous visible files, then publish
    if (fs.exists(d)) fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith(".") && !n.startsWith("_"))
        fs.delete(st.getPath, false)
    }
    require(fs.rename(tmp, new Path(d, name)),
      s"MetaIO.writeTable: could not publish $tmp")
  }

  private def writeRows(
      writer: org.apache.parquet.hadoop.ParquetWriter[Group],
      gf: SimpleGroupFactory, cols: Seq[(String, MT)],
      rows: Seq[Seq[Any]]): Unit =
    rows.foreach { r =>
      val g = gf.newGroup()
      cols.zip(r).foreach { case ((n, t), v) =>
        if (v != null) t match {
          case MString => g.add(n, v.asInstanceOf[String])
          case MInt => g.add(n, v.asInstanceOf[Int])
          case MLong => g.add(n, v.asInstanceOf[Long])
          case MDouble => g.add(n, v.asInstanceOf[Double])
          case MBoolean => g.add(n, v.asInstanceOf[Boolean])
          case MStringList =>
            val lst = g.addGroup(n)
            v.asInstanceOf[Seq[String]].foreach { e =>
              val entry = lst.addGroup("list")
              if (e != null) entry.add("element", e)
            }
          case MFloatMatrix =>
            val lst = g.addGroup(n)
            v.asInstanceOf[Seq[Seq[Float]]].foreach { rowv =>
              val entry = lst.addGroup("list")
              if (rowv != null) {
                val inner = entry.addGroup("element")
                rowv.foreach { f =>
                  inner.addGroup("list").add("element", f)
                }
              }
            }
        }
      }
      writer.write(g)
    }

  /** Append `rows` as ONE new parquet file beside the existing ones
    * (hidden temp + rename, complete-only-visible). */
  def appendTable(conf: Configuration, dir: String, cols: Seq[(String, MT)],
                  rows: Seq[Seq[Any]]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val schema = schemaOf(cols, "graft_meta")
    val name = s"part-a-${java.util.UUID.randomUUID()}.parquet"
    val tmp = new Path(d, s".$name.tmp")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(tmp, conf))
      .withType(schema).withConf(conf).build()
    try writeRows(writer, new SimpleGroupFactory(schema), cols, rows)
    finally writer.close()
    require(fs.rename(tmp, new Path(d, name)),
      s"MetaIO.appendTable: could not publish $tmp")
  }

  private def visibleParquetFiles(conf: Configuration, dir: String)
      : Seq[FileStatus] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    // let a missing dir throw the filesystem's own FileNotFoundException
    // — callers keep their existing transient-vs-permanent discipline
    fs.listStatus(d).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_") &&
        st.getLen > 0
    }
  }

  /** Every row of every visible parquet file under `dir`, decoded to
    * field-name -> value maps (string, int, long, double, boolean,
    * Seq[String] for 3-level string lists; absent/null fields map to
    * null). Small-table use only — the whole result is materialized on
    * the driver. */
  def readTable(conf: Configuration, dir: String): Seq[Map[String, Any]] = {
    val files = visibleParquetFiles(conf, dir)
    // zero VISIBLE files is never a legal metadata table (an empty
    // table is one zero-row file): it is the mid-overwrite window of a
    // concurrent writer, or debris — throw the same missing-file class
    // the Spark reader surfaced (UNABLE_TO_INFER_SCHEMA), which every
    // caller already maps to its transient/permanent discipline
    if (files.isEmpty)
      throw new java.io.FileNotFoundException(
        s"$dir: no visible parquet files (mid-publish window)")
    files.flatMap { st =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), st.getPath)
        .withConf(conf).build()
      try {
        val b = Seq.newBuilder[Map[String, Any]]
        var g: Group = reader.read()
        while (g != null) {
          b += decode(g)
          g = reader.read()
        }
        b.result()
      } finally reader.close()
    }
  }

  private def decode(g: Group): Map[String, Any] = {
    val t = g.getType
    // insertion-ordered map: consumers that rebuild a schema-carrying
    // Row from these entries (Dedup.readParamsRow) must see the file's
    // field order, not hash order — a positional consumer added later
    // would otherwise break nondeterministically (tables are KB-scale,
    // so ListMap's quadratic build cost is irrelevant)
    val m = scala.collection.immutable.ListMap.newBuilder[String, Any]
    (0 until t.getFieldCount).foreach { i =>
      val f = t.getType(i)
      val n = f.getName
      val rep = g.getFieldRepetitionCount(i)
      if (rep == 0) m += n -> null
      else if (f.isPrimitive) {
        val v: Any = f.asPrimitiveType().getPrimitiveTypeName match {
          case BINARY | FIXED_LEN_BYTE_ARRAY =>
            if (f.getLogicalTypeAnnotation == LogicalTypeAnnotation.stringType())
              g.getString(i, 0)
            else g.getBinary(i, 0).getBytes
          case INT32 => g.getInteger(i, 0)
          case INT64 => g.getLong(i, 0)
          case DOUBLE => g.getDouble(i, 0)
          case FLOAT => g.getFloat(i, 0)
          case BOOLEAN => g.getBoolean(i, 0)
          case INT96 => g.getInt96(i, 0).getBytes
        }
        m += n -> v
      } else {
        // 3-level LIST (string elements, or — r20, the IVF quantizer
        // matrices — nested float-list elements); tolerate the legacy
        // 2-level "array"/"bag" shape
        m += n -> decodeList(g.getGroup(i, 0))
      }
    }
    m.result()
  }

  /** Decode a 3-level LIST group: `list` entries whose `element` is a
    * string, a float, or itself a LIST (recursing — covers Spark's
    * `array<array<float>>` encoding). Absent elements decode to null. */
  private def decodeList(lg: Group): Seq[Any] = {
    val entries = lg.getFieldRepetitionCount(0)
    (0 until entries).map { j =>
      val entry = lg.getGroup(0, j)
      if (entry.getFieldRepetitionCount(0) == 0) null
      else {
        val el = entry.getType.getType(0)
        if (el.isPrimitive)
          el.asPrimitiveType().getPrimitiveTypeName match {
            case FLOAT => entry.getFloat(0, 0)
            case DOUBLE => entry.getDouble(0, 0)
            case INT32 => entry.getInteger(0, 0)
            case INT64 => entry.getLong(0, 0)
            case BOOLEAN => entry.getBoolean(0, 0)
            case _ => entry.getString(0, 0)
          }
        else decodeList(entry.getGroup(0, 0))
      }
    }
  }

  /** Max of an INT64 column over every visible parquet file under
    * `dir`, answered from FOOTER COLUMN STATISTICS only — a driver-side
    * metadata read, zero Spark jobs, for the "stamp the watermark of
    * the table we just wrote" pattern (the writer always emits min/max
    * stats for plain int64 columns).
    *
    * WALK SCOPE: with `subDirs = None` the walk reads the directory
    * AS-IS — it does not consult the member-dir registry the Spark
    * read path honors — so it is only sound on freshly-written tables
    * (both overwrite-build call sites run immediately after an
    * overwrite + registry replace-sync, where the two sets coincide).
    * A caller on a REGISTRY table at an arbitrary lifecycle point must
    * pass the registered dir list as `subDirs` so the walk matches the
    * read path exactly (unregistered debris dirs excluded); a listed
    * subdir that is absent yields `None` — the transient mid-swap
    * state, which the caller's scan fallback maps to its existing
    * retry discipline.
    *
    * Returns:
    *  - `None` when the footers cannot answer definitively (column
    *    absent / not a top-level int64 / stats missing or non-exact in
    *    any block) — the caller must fall back to a real scan;
    *  - `Some(None)` when the table provably has zero non-null values;
    *  - `Some(Some(v))` for the exact max.
    */
  def statsMaxLong(conf: Configuration, dir: String, colName: String,
                   subDirs: Option[Seq[String]] = None)
      : Option[Option[Long]] = {
    try {
      // recurse into partition dirs (shard=K/...) — the callers stamp
      // partitionBy tables; hidden/underscore entries stay skipped
      def walk(p: Path): Seq[FileStatus] = {
        val fs = p.getFileSystem(conf)
        fs.listStatus(p).toSeq.flatMap { st =>
          val n = st.getPath.getName
          if (n.startsWith(".") || n.startsWith("_")) Nil
          else if (st.isDirectory) walk(st.getPath)
          else if (st.getLen > 0) Seq(st)
          else Nil
        }
      }
      val files = subDirs match {
        case None => walk(new Path(dir))
        case Some(ds) => ds.flatMap(d => walk(new Path(dir, d)))
      }
      var max: Option[Long] = None
      files.foreach { st =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader
          .open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          val md = reader.getFooter.getBlocks
          val it = md.iterator()
          while (it.hasNext) {
            val block = it.next()
            val cit = block.getColumns.iterator()
            var found = false
            while (cit.hasNext) {
              val c = cit.next()
              if (c.getPath.size() == 1 &&
                  c.getPath.toDotString == colName) {
                found = true
                if (c.getPrimitiveType.getPrimitiveTypeName != INT64)
                  return None
                val s = c.getStatistics
                if (s == null || !s.hasNonNullValue) {
                  // all-null (or empty) chunk is fine; UNKNOWN stats are
                  // not — distinguish via value count vs null count
                  if (s == null || s.isNumNullsSet == false) return None
                  if (s.getNumNulls < c.getValueCount) return None
                } else {
                  val m = s.genericGetMax.asInstanceOf[Long]
                  if (max.forall(_ < m)) max = Some(m)
                }
              }
            }
            if (!found && block.getRowCount > 0) return None
          }
        } finally reader.close()
      }
      Some(max)
    } catch { case _: Exception => None }
  }

  /** Total row count over every visible parquet data file under `dir`
    * (recursing into partition dirs, hidden/underscore entries skipped),
    * answered from FOOTER metadata only — parquet row counts are exact
    * by format, so this is the "how many rows did the table we just
    * wrote get" pattern with zero Spark jobs. `None` when the directory
    * cannot be walked or any footer is unreadable — callers fall back
    * to a real count. Same freshly-written-table precondition as
    * [[statsMaxLong]]: the walk sees the directory as-is, with no
    * member-dir registry filtering. */
  def rowCount(conf: Configuration, dir: String): Option[Long] =
    try {
      def walk(p: Path): Seq[FileStatus] = {
        val fs = p.getFileSystem(conf)
        fs.listStatus(p).toSeq.flatMap { st =>
          val n = st.getPath.getName
          if (n.startsWith(".") || n.startsWith("_")) Nil
          else if (st.isDirectory) walk(st.getPath)
          else if (st.getLen > 0) Seq(st)
          else Nil
        }
      }
      var total = 0L
      walk(new Path(dir)).foreach { st =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader
          .open(HadoopInputFile.fromPath(st.getPath, conf))
        try total += reader.getRecordCount
        finally reader.close()
      }
      Some(total)
    } catch { case _: Exception => None }

  /** The Spark schema a Spark parquet writer embedded in `file`'s
    * footer (`org.apache.spark.sql.parquet.row.metadata`), decoded to a
    * StructType — a driver-side footer read that lets explicit-file-list
    * opens skip the distributed schema-inference job. None when the
    * file is unreadable, not Spark-written, or the JSON does not decode
    * (callers fall back to inference). */
  def sparkFileSchema(conf: Configuration, file: String)
      : Option[org.apache.spark.sql.types.StructType] =
    try {
      val r = org.apache.parquet.hadoop.ParquetFileReader
        .open(HadoopInputFile.fromPath(new Path(file), conf))
      val json =
        try Option(r.getFooter.getFileMetaData.getKeyValueMetaData
          .get("org.apache.spark.sql.parquet.row.metadata"))
        finally r.close()
      json.flatMap(j => scala.util.Try(
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
    } catch { case _: Exception => None }

  /** Convenience: the single string column of every row (manifest /
    * generation-record name tables). */
  def readStrings(conf: Configuration, dir: String): Seq[String] =
    readTable(conf, dir).map(_.valuesIterator.next().asInstanceOf[String])

  /** Convenience: the single long column of every row. */
  def readLongs(conf: Configuration, dir: String): Seq[Long] =
    readTable(conf, dir).map(_.valuesIterator.next() match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalStateException(
        s"MetaIO.readLongs: non-integral value $other")
    })
}
