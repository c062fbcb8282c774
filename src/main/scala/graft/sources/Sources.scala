package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File sources — the reader surface of the reference's Dataset
  * (/root/reference/code/recipes.py:529-606, options 384-447).
  *
  * Reference semantics preserved: every ingested column is a STRING
  * (`dtype=object`, recipes.py:539) and missing cells are empty strings,
  * not nulls (`keep_default_na=False`). Operators cast explicitly
  * (to_integer / to_float / parsedate).
  *
  * Scale: these map straight onto Spark's distributed readers — a path
  * glob fans out to one task per file split; column pruning/pushdown
  * stays with Catalyst.
  */
object Sources {

  /** CSV with the reference's defaults: sep=";", header inferred, all
    * columns string, missing → "" (recipes.py:535-541). `names` overrides
    * the header; `select` prunes columns at the scan (usecols pushdown).
    * `skiprows` drops the first N physical lines of each file BEFORE the
    * header is read (recipes.py:386-388,539) — Spark has no such option,
    * so the lines are dropped from split 0 of a per-file text scan
    * (HadoopRDD split order is the file's byte order, so the first N
    * lines always live in split 0; everything stays distributed). */
  def csv(spark: SparkSession, path: String,
      sep: String = ";",
      header: Boolean = true,
      names: Seq[String] = Nil,
      encoding: String = "UTF-8",
      select: Seq[String] = Nil,
      skiprows: Int = 0): DataFrame = {
    var r = spark.read
      .option("sep", sep)
      .option("header", header && names.isEmpty)
      .option("encoding", encoding)
      .option("inferSchema", false) // all-string, like dtype=object
      .option("nullValue", "\u0000") // nothing maps to null; "" stays ""
      .option("mode", "PERMISSIVE")
    val df0 =
      if (skiprows <= 0) r.csv(path)
      else {
        import spark.implicits._
        // resolve the glob driver-side (metadata only), skip per file.
        // A DIRECTORY (or a glob matching directories) expands to its
        // data files — treating it as one concatenated stream would drop
        // the skip lines from the FIRST file only and ingest the other
        // files' preambles as data. Hidden files (_SUCCESS, .crc) are
        // excluded the way Spark's own file index excludes them.
        val hconf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(hconf)
        def visible(st: org.apache.hadoop.fs.FileStatus): Boolean = {
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
          .flatMap { st =>
            if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(s => s.isFile && visible(s))
            else Seq(st)
          }
          .map(_.getPath.toString).sorted match {
          case Nil => Seq(path) // plain file path, no glob match needed
          case fs0 => fs0
        }
        // textFile decodes UTF-8 unconditionally; for other charsets read
        // the raw line bytes (Hadoop Text) and decode with the requested
        // encoding — same input splits, correct bytes. Validate the name
        // driver-side; ship only the NAME (Charset isn't serializable).
        val charset = java.nio.charset.Charset.forName(encoding)
        // TextInputFormat splits records on the single byte \n, so this
        // path only works for charsets that encode '\n' as exactly 0x0A
        // (ASCII-compatible: latin-1, windows-125x, Shift_JIS, UTF-8…).
        // UTF-16/32 lines would be split mid-character into garbage —
        // reject them loudly instead.
        val nl = charset.encode("\n")
        require(nl.remaining == 1 && nl.get(0) == 0x0a,
          s"skiprows with encoding=$encoding is unsupported: records are " +
            "split on the single byte \\n, which this charset does not " +
            "encode as one byte (use a single-byte/ASCII-compatible " +
            "encoding, or strip the preamble upstream)")
        val encName = charset.name
        def readLines(f: String) =
          if (charset == java.nio.charset.StandardCharsets.UTF_8)
            spark.sparkContext.textFile(f)
          else
            spark.sparkContext
              .hadoopFile[org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text,
                org.apache.hadoop.mapred.TextInputFormat](f)
              .map { case (_, t) => new String(t.copyBytes, encName) }
        val lines = files.map { f =>
          readLines(f).mapPartitionsWithIndex {
            case (0, it) => it.drop(skiprows)
            case (_, it) => it
          }
        }.reduce(_ union _)
        r.csv(spark.createDataset(lines))
      }
    val df1 =
      if (names.nonEmpty) df0.toDF(names: _*)
      else df0
    // reference fills missing with "" (keep_default_na=False)
    val df2 = df1.select(df1.columns.toIndexedSeq.map(c => coalesce(col(c), lit("")).as(c)): _*)
    if (select.nonEmpty) df2.select(select.map(col): _*) else df2
  }

  /** JSON-lines, primitives kept as strings (recipes.py:542-548). */
  def jsonl(spark: SparkSession, path: String, select: Seq[String] = Nil): DataFrame = {
    val df = spark.read.option("primitivesAsString", true).json(path)
    if (select.nonEmpty) df.select(select.map(col): _*) else df
  }

  /** Fixed-width file: text lines sliced by `widths` into `names`
    * (recipes.py:549-556). No built-in FWF reader exists; substring
    * slicing is codegen'd and runs at scan speed. */
  def fwf(spark: SparkSession, path: String,
      widths: Seq[Int], names: Seq[String]): DataFrame = {
    require(widths.length == names.length, "widths and names must align")
    val offsets = widths.scanLeft(1)(_ + _)
    val text = spark.read.text(path)
    text.select(
      names.zipWithIndex.map { case (n, i) =>
        trim(substring(col("value"), offsets(i), widths(i))).as(n)
      }: _*)
  }

  /** Parquet (recipes.py:569-576). */
  def parquet(spark: SparkSession, path: String, select: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    if (select.nonEmpty) df.select(select.map(col): _*) else df
  }

  /** One table of a document-index layout (`Sinks.indexed`: docs/ or
    * postings/) with tombstones ([[Sinks.deleteFromIndexed]])
    * suppressed — ONE reader shared by the recipe `index` dataset,
    * the match step's right side (it resolves through that dataset
    * read), and the API `_search` route, so a taken-down doc vanishes
    * from every consumer at once. Broadcast anti-join on `_id`
    * (takedowns are declared-small); no deletes/ → the plain read.
    *
    * Certificate-gated (r14 verdict #1 — the discipline the other two
    * persisted artifacts already share): the read refuses loudly
    * unless the store's manifest certifies a COMPLETE build, and the
    * read is PATIENT — a compaction retracts the certificate for its
    * narrow file-swap window, and a probe landing inside it (this is
    * live behind the API `_search` route, where "maintenance window"
    * is someone else's query) rides it out on the bounded retry
    * instead of transiently missing docs mid-swap. */
  def indexedTable(spark: SparkSession, path: String,
      table: String, suppressDeletes: Boolean = true): DataFrame =
    indexedTables(spark, path, Seq(table), suppressDeletes).head

  /** [[indexedTable]] for SEVERAL tables of one store inside a SINGLE
    * version bracket — the two-table consumers' opener (`_search`
    * matches postings then fetches docs; the q139 probe joins both).
    * Separate brackets would each be internally consistent yet could
    * straddle an APPEND, pairing a pre-append docs listing with a
    * post-append postings listing — a posting whose doc fetch misses.
    * One bracket pins every listed table to the same certified
    * store version. */
  def indexedTables(spark: SparkSession, path: String,
      tables: Seq[String], suppressDeletes: Boolean = true)
      : Seq[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // VERSION-STABLE open (r15, the shared index-opener discipline):
    // the listings, the dead-file exclusion, and the eager tombstone
    // snapshot all sit inside one bracket keyed on the manifest's
    // re-issue counter, so a purge's file swap can never interleave a
    // reader's listing (old AND new copies of the same doc) and a
    // pre-purge listing can never pair with a post-purge emptied
    // tombstone set (purged docs would resurface for that reader).
    graft.engine.LayoutFs.consistentSnapshot(
        s"indexedTable(${tables.mkString(",")}) at '$path'",
        Sinks.readIndexedSnapshotKey(spark, path)) {
      Sinks.readIndexedManifestPatient(spark, path).getOrElse(sys.error(
        s"indexedTable: no store manifest at '$path' — the document-" +
          "store build did not complete (or a crashed maintenance run " +
          "left it torn); rebuild with the index sink"))
      val dead = Sinks.readIndexedDead(spark, path)
      val delP = new org.apache.hadoop.fs.Path(s"$path/deletes")
      // hasVisibleParquetFile, not exists: a deletes/ dir holding only
      // a crashed write's husks must read as "no tombstones", not
      // crash every consumer on schema inference (the maybeCompact*
      // rule). EAGER snapshot: a purge consuming the tombstone files
      // mid-read must not fail this reader's lazy scan.
      val delIds: Option[(Seq[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType)] =
        if (!suppressDeletes ||
            !graft.engine.LayoutFs.hasVisibleParquetFile(fs, delP)) None
        else {
          val delDf = spark.read.parquet(delP.toString)
            .select(col("_id")).distinct()
          val ids = delDf.collect().toIndexedSeq
          if (ids.isEmpty) None else Some((ids, delDf.schema))
        }
      tables.map { table =>
        val deadT = dead.getOrElse(table, Nil).toSet
        val df =
          if (deadT.isEmpty) spark.read.parquet(s"$path/$table")
          else {
            // a purge's replaced files: on disk for readers whose
            // listing predates it, excluded by name here, collected
            // at the next maintenance entry
            val livePaths = fs.listStatus(
                new org.apache.hadoop.fs.Path(s"$path/$table")).toSeq
              .filter(st => st.isFile &&
                st.getPath.getName.endsWith(".parquet") &&
                !deadT(st.getPath.getName))
              .map(_.getPath.toString)
            if (livePaths.isEmpty)
              spark.read.parquet(s"$path/$table").limit(0)
            else spark.read.parquet(livePaths: _*)
          }
        delIds match {
          case None => df
          case Some((ids, schema)) =>
            df.join(
              broadcast(spark.createDataFrame(
                scala.jdk.CollectionConverters.SeqHasAsJava(ids).asJava,
                schema)),
              Seq("_id"), "left_anti")
        }
      }
    }
  }

  /** ORC — beyond the reference's formats, but table stakes for a Spark
    * library: the other columnar lake format, with the same pushdown/
    * pruning story as parquet (built into spark-sql, no extra jars). */
  def orc(spark: SparkSession, path: String, select: Seq[String] = Nil): DataFrame = {
    val df = spark.read.orc(path)
    if (select.nonEmpty) df.select(select.map(col): _*) else df
  }

  /** Avro — beyond the reference's formats: the row-major
    * schema-carrying lake format (this Spark distribution bundles the
    * avro datasource in its sql module). Columnar pruning doesn't
    * apply (row-major), but partition pruning and file-level filters
    * do; prefer parquet/ORC for analytics, avro for row-streaming
    * interchange. */
  def avro(spark: SparkSession, path: String, select: Seq[String] = Nil): DataFrame = {
    // FQCN, not "avro": this distribution bundles the avro classes in
    // the sql module but without the DataSourceRegister service entry,
    // so the short name does not resolve
    val df = spark.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(path)
    if (select.nonEmpty) df.select(select.map(col): _*) else df
  }

  /** XML — the datasource built into Spark 4's sql module: `rowTag`
    * names the repeated record element; attributes arrive as
    * `_attr`-prefixed columns. For feed-style corpora (sitemaps, dumps
    * of the Wikipedia/arXiv shape) that arrive as XML. */
  def xml(spark: SparkSession, path: String, rowTag: String = "row",
      select: Seq[String] = Nil): DataFrame = {
    val df = spark.read.format("xml").option("rowTag", rowTag).load(path)
    if (select.nonEmpty) df.select(select.map(col): _*) else df
  }

  /** Multi-file read: regex over a directory, matched files read as one
    * dataset (recipes.py:356-366) — Spark unions them at the scan, one
    * task per split. Listing goes through the Hadoop FileSystem API, so
    * the same call works on local paths, HDFS, and s3a:// (the
    * reference's s3 variant, recipes.py:368-381). Metadata-only on the
    * driver — no data moves until the action. */
  def multiFile(spark: SparkSession, dir: String, regex: String,
      read: String => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches(regex))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no files in $dir matching $regex")
    files.map(read).reduce(_ unionByName _)
  }

  /** JDBC source with query pushdown (recipes.py:484-509): the `select`
    * SQL runs in-database; test mode's LIMIT rewrite is just `.limit(n)`
    * (Catalyst pushes it into the JDBC query). */
  def jdbc(spark: SparkSession, url: String, table: String,
      query: Option[String] = None,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url)
    val withTarget = query match {
      case Some(q) => r.option("query", q)
      case None    => r.option("dbtable", table)
    }
    props.foldLeft(withTarget) { case (rr, (k, v)) => rr.option(k, v) }.load()
  }
}

/** File sinks (recipes.py:852-946). */
object Sinks {

  /** CSV out: header, configurable sep; `names` fixes column order
    * (sorted otherwise, recipes.py:865). Single-file output (the
    * reference appends chunks to one file) = coalesce(1); leave
    * partitioned for scale. */
  def csv(df: DataFrame, path: String, sep: String = ";",
      names: Seq[String] = Nil, singleFile: Boolean = false,
      mode: String = "overwrite"): Unit = {
    val cols = if (names.nonEmpty) names else df.columns.sorted.toSeq
    val out = df.select(cols.map(col): _*)
    (if (singleFile) out.coalesce(1) else out)
      .write.mode(mode).option("header", true).option("sep", sep).csv(path)
  }

  /** Fixed-width out: left-justified pad to widths (fwf_format/to_fwf,
    * recipes.py:77-108) → one text column. */
  def fwf(df: DataFrame, path: String, widths: Seq[Int],
      names: Seq[String], mode: String = "overwrite"): Unit = {
    val line = concat(names.zip(widths).map { case (n, w) =>
      val v = coalesce(col(n).cast(StringType), lit(""))
      // rpad silently TRUNCATES overlong values — corrupting an export
      // with no signal; fail the job naming the column instead
      when(length(v) > w, raise_error(concat(
          lit(s"fwf: value for column '$n' exceeds width $w: '"), v, lit("'"))))
        .otherwise(rpad(v, w, " "))
    }: _*)
    df.select(line.as("value")).write.mode(mode).text(path)
  }

  /** Parquet out; `partitionBy` lays the dataset out hive-style so
    * partition-key predicates prune whole directories at the scan — the
    * primary data-layout lever at 100 TB. */
  def parquet(df: DataFrame, path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC sink — same layout levers as the parquet sink. */
  def orc(df: DataFrame, path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** JSON-lines sink — the write side of [[Sources.jsonl]] (one JSON
    * object per line; the interchange format most text-corpus tooling
    * speaks). */
  def jsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Avro sink — same partitionBy layout lever as parquet/ORC. FQCN
    * for the same service-registration reason as [[Sources.avro]]. */
  def avro(df: DataFrame, path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
      .format("org.apache.spark.sql.avro.AvroFileFormat")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** XML sink — records wrapped in `rowTag` elements. */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("xml").option("rowTag", rowTag).save(path)

  /** `update` output mode — the ES doc-upsert analogue
    * (recipes.py:783-785, 1096-1100): merge-by-key into an existing
    * parquet dataset, new rows winning on key collision. Implemented as
    * read-union-dedup-rewrite (Delta-style merge without a table
    * format); at cluster scale the same call targets a real lakehouse
    * MERGE. */
  // one lock per target path: concurrent upserts to the same dataset
  // (e.g. parallel /_update API requests) would otherwise race on the
  // shared tmp dir and the read-delete-rename commit, losing a write.
  // JVM-local — multi-driver writers need a real table format's MERGE.
  private val upsertLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Partial-doc upsert (ES `_update` semantics, api.py:784-811): the
    * posted columns overlay the stored row for that id, every other
    * stored column is kept, posted-only columns are added. The read of
    * the existing row happens INSIDE the per-path lock — building the
    * merge plan outside it would capture a file listing that a
    * concurrent upsert's delete+rename commit invalidates mid-write. */
  def upsertPartial(doc: DataFrame, path: String, idCol: String): Unit = {
    val lock = upsertLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      val spark = doc.sparkSession
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val merged =
        if (!fs.exists(target)) doc
        else {
          val table = spark.read.parquet(path)
          // align the merge-key type with the stored table (callers may
          // have typed the id from a pre-lock schema read that raced)
          val doc0 = scala.util.Try(table.schema(idCol).dataType).toOption
            .map(t => doc.withColumn(idCol, col(idCol).cast(t))).getOrElse(doc)
          val old = table.join(doc0.select(col(idCol)), Seq(idCol), "left_semi")
          if (old.isEmpty) doc0
          else {
            val doc = doc0
            val posted = doc.columns.filterNot(_ == idCol).toSet
            // posted values are cast to the stored column type so the
            // parquet schema stays stable under repeated updates
            val keepOrOverlay = table.schema.fields.toSeq.map { f =>
              if (f.name == idCol) col(s"old.`${f.name}`").as(f.name)
              else if (posted.contains(f.name))
                col(s"new.`${f.name}`").cast(f.dataType).as(f.name)
              else col(s"old.`${f.name}`").as(f.name)
            }
            val newOnly = doc.schema.fields.toSeq
              .filterNot(f => f.name == idCol || table.columns.contains(f.name))
              .map(f => col(s"new.`${f.name}`").as(f.name))
            val overlaid = old.as("old").join(doc.as("new"),
                col(s"old.`$idCol`") === col(s"new.`$idCol`"))
              .select(keepOrOverlay ++ newOnly: _*)
            // a MIXED batch (existing + new ids) must also INSERT its
            // new-id rows — the overlay inner join keeps only existing
            // ids, so without this union new docs vanish silently.
            // Shared columns are cast to the stored types so the union
            // resolves; stored-only columns surface as null, the same
            // shape an all-new insert produces.
            val inserts0 = doc.join(table.select(col(idCol)), Seq(idCol), "left_anti")
            val inserts = table.schema.fields.foldLeft(inserts0) { (d, f) =>
              if (f.name != idCol && d.columns.contains(f.name))
                d.withColumn(f.name, col(f.name).cast(f.dataType))
              else d
            }
            overlaid.unionByName(inserts, allowMissingColumns = true)
          }
        }
      writeLocked(merged, path, idCol)
    }
  }

  def upsert(df: DataFrame, path: String, idCol: String): Unit = {
    val lock = upsertLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized { writeLocked(df, path, idCol) }
  }

  /** The shared read-union-dedup-rewrite body; callers hold the path
    * lock. Existing rows whose id appears in `newRows` are replaced. */
  private def writeLocked(newRows: DataFrame, path: String, idCol: String): Unit = {
    val spark = newRows.sparkSession
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(path)
        val keep = existing.join(newRows.select(col(idCol)), Seq(idCol), "left_anti")
        keep.unionByName(newRows, allowMissingColumns = true)
      } else newRows
    // write the merged result to a temp dir first (the source partition
    // can't be overwritten while it is being read), then commit with a
    // directory rename — one metadata op on HDFS-like stores, and the
    // window where the target is absent is delete→rename only. At
    // lakehouse scale the same call maps to a real MERGE on a table
    // format with snapshot isolation.
    val tmp = new org.apache.hadoop.fs.Path(path + "__upsert_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      sys.error(s"upsert commit failed: could not rename $tmp to $target")
  }

  /** JDBC sink: create (overwrite) / append, mirroring output modes
    * (recipes.py:921-946, 1096-1100). */
  def jdbc(df: DataFrame, url: String, table: String, mode: String = "append",
      props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    props.foldLeft(w) { case (ww, (k, v)) => ww.option(k, v) }
      .mode(if (mode == "create") "overwrite" else mode).save()
  }

  /** The document store's manifest certificate (r14 verdict #1 — the
    * same discipline the ANN and band indexes carry): one tiny JSON
    * line written LAST on build/append, retracted only for a
    * compaction's narrow file-swap window. Its presence certifies
    * BOTH tables complete; `rows` is the certified docs/ total (what
    * makes the pct purge knob free to check); `version` bumps per
    * mutation. Parsed with a regex, like its siblings — no JSON
    * library in the dependency budget, and the shape is one flat
    * line this module itself writes. */
  private[graft] def indexedManifestFile(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_MANIFEST.json")

  private[graft] def writeIndexedManifest(spark: SparkSession,
      path: String, rows: Long, version: Long,
      marks: Map[String, Long] = Map.empty,
      dead: Map[String, Seq[String]] = Map.empty): Unit = {
    val p = indexedManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mark keys sanitized on write (the shared manifest discipline):
    // the stream tag is an MD5 prefix, but a hand-edited manifest must
    // not smuggle JSON through the parser's regex
    val marksJson = marks.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${k.replaceAll("[^0-9a-zA-Z]", "")}": $v""" }
      .mkString("{", ", ", "}")
    val out = fs.create(p, true)
    try out.write(
      (s"""{"rows": $rows, "version": $version, """ +
        s""""stream_marks": $marksJson, """ +
        s""""dead_files": ${graft.engine.LayoutFs.deadFilesJson(dead)}, """ +
        s""""built_ms": ${System.currentTimeMillis()}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The store manifest's dead-file grace list per table (a purge's
    * replaced files, retained on disk one maintenance cycle for
    * in-flight readers — [[Sinks.compactIndexed]]): readers exclude
    * them, the next maintenance entry collects them. */
  private[graft] def readIndexedDead(spark: SparkSession,
      path: String): Map[String, Seq[String]] = {
    val p = indexedManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    graft.engine.LayoutFs.parseDeadFiles(txt)
  }

  /** The doc store's replay watermarks: max batch-appended epoch per
    * stream tag ([[graft.dedup.Dedup.readNearDupMarks]]'s twin —
    * unlike the epoch-partitioned indexes these gate the APPEND
    * itself, since a flat table cannot overwrite "its own epoch").
    * Pre-streaming manifests (no key) read as empty. */
  private[graft] def readIndexedMarks(spark: SparkSession,
      path: String): Map[String, Long] = {
    val p = indexedManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val obj = """"stream_marks":\s*\{([^}]*)\}""".r
      .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    """"([0-9a-zA-Z]+)":\s*(-?\d+)""".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** [[readIndexedMarks]] riding out a retraction window — an absent
    * manifest must not read as "no marks" mid-swap. Empty only on
    * PERMANENT absence (the caller's own manifest read then refuses
    * loudly). */
  private[graft] def readIndexedMarksPatient(spark: SparkSession,
      path: String): Map[String, Long] =
    graft.engine.LayoutFs.patiently {
      val p = indexedManifestFile(path)
      if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(p)) None
      else Some(readIndexedMarks(spark, path))
    }.getOrElse(Map.empty)

  /** (rows, version), or None when absent — an incomplete build or a
    * retraction window. */
  private[graft] def readIndexedManifest(spark: SparkSession,
      path: String): Option[(Long, Long)] = {
    val p = indexedManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def f(k: String): Option[Long] =
      (s""""$k":\\s*(-?\\d+)""").r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
    for (r <- f("rows"); v <- f("version")) yield (r, v)
  }

  /** The openers' snapshot-bracket key: the version MIXED with the
    * manifest's build stamp — a REBUILD resets the version counter,
    * so version alone could alias across one (ABA); the stamp breaks
    * the tie. */
  private[graft] def readIndexedSnapshotKey(spark: SparkSession,
      path: String): Option[Long] = {
    val p = indexedManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def f(k: String): Long =
      (s""""$k":\\s*(-?\\d+)""").r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(0L)
    Some(f("version") * 0x9E3779B97F4A7CL + f("built_ms"))
  }

  /** [[readIndexedManifest]] riding out a compaction's retraction
    * window on the shared bounded retry
    * ([[graft.engine.LayoutFs.patiently]]): a `_search` or recipe
    * read landing mid-swap waits ~1 s; a PERMANENT absence still
    * refuses loudly one level up. */
  private[graft] def readIndexedManifestPatient(spark: SparkSession,
      path: String): Option[(Long, Long)] =
    graft.engine.LayoutFs.patiently(readIndexedManifest(spark, path))

  /** The ES-bulk analogue: a "document store" write — parquet table plus
    * a derived token-postings index table for the match join
    * (SURVEY §2.4.3). `_id` = provided column or a row hash
    * (recipes.py:771-790; blake3 → xxhash64, ids are per-run stable).
    *
    * Lifecycle discipline (r14 verdict #1): a REBUILD retracts the
    * manifest first (a crash between the two table writes must not
    * leave the previous build's certificate endorsing half-written
    * tables) and re-issues it LAST, with the certified row total; an
    * APPEND extends a COMPLETE store only (no certificate = loud
    * refusal), stages both tables' files to side dirs first — the
    * long O(batch) part, certificate intact so concurrent `_search`
    * and recipe reads never block — then retracts the manifest only
    * for the fast file moves (the fold's stage-before-retract shape),
    * with incremental row accounting (certified + batch, no table
    * re-list). Appends and compactions exclude each other via the
    * shared atomic `_APPENDING`/`_COMPACTING` markers. */
  def indexed(df: DataFrame, path: String, idCol: Option[String],
      analyzedCol: String, mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val withId = idCol match {
      case Some(c) => df.withColumn("_id", col(c))
      case None    => df.withColumn("_id", xxhash64(df.columns.toIndexedSeq.map(col): _*))
    }
    def postings(d: DataFrame) =
      d.select(col("_id"),
        explode(array_distinct(col(analyzedCol))).as("token"))
    if (mode == "append") {
      appendIndexedBatch(df, path, idCol, analyzedCol, markUpdate = None)
    } else {
      // a REBUILD that dies between the table writes must not leave
      // the PREVIOUS build's certificate endorsing the new
      // half-written tables — retract first, re-issue only after both
      // tables landed. Stale tombstones go with the tables (the
      // writeIvfIndex / writeNearDupIndex discipline): the new corpus
      // is the caller's authority on membership.
      fs.delete(indexedManifestFile(path), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes"), true)
      withId.write.mode(mode).parquet(s"$path/docs")
      // recompute from the written table, not the input: one pass over
      // the input total, and the two tables cannot disagree
      val written = spark.read.parquet(s"$path/docs")
      postings(written).write.mode(mode).parquet(s"$path/postings")
      writeIndexedManifest(spark, path, written.count(), version = 1L)
    }
  }

  /** The staged doc-store append core, shared by the batch sink
    * (mode=append) and the streaming sink
    * ([[graft.streaming.EventStream.indexedStream]]). `markUpdate` =
    * the stream's (checkpoint-tag, epoch) watermark: a flat layout
    * cannot overwrite "its own epoch" the way the epoch-partitioned
    * indexes do, so replay idempotency gates the APPEND itself — an
    * epoch at or below its tag's mark is skipped (its rows already
    * landed), the mark advances with the manifest re-issue, and an
    * empty stream batch writes nothing. Torn window: the staged
    * writes are the long part (certificate intact); a crash inside
    * the rename window leaves a loudly-unreadable store — for the
    * STREAM case that window is the one state a replay cannot heal
    * (half the files renamed into a flat table), the price of the
    * flat layout, documented on the sink. */
  private[graft] def appendIndexedBatch(df: DataFrame, path: String,
      idCol: Option[String], analyzedCol: String,
      markUpdate: Option[(String, Long)]): Unit = {
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    markUpdate.foreach { case (tag, ep) =>
      require(tag.matches("[0-9a-zA-Z]+"),
        s"appendIndexedBatch: stream tag '$tag' must be alphanumeric " +
          "(manifest mark keys are)")
      if (readIndexedMarksPatient(spark, path).get(tag).exists(ep <= _))
        return
    }
    // empty batches write nothing in EITHER mode: the staged-docs
    // re-read below would die on schema inference over a data-less
    // staging dir, and a no-op append should not churn the version
    if (df.isEmpty) return
    val withId = idCol match {
      case Some(c) => df.withColumn("_id", col(c))
      case None => df.withColumn("_id",
        xxhash64(df.columns.toIndexedSeq.map(col): _*))
    }
    val (rows0, version0) =
      readIndexedManifestPatient(spark, path).getOrElse(sys.error(
        s"index sink (append): no store manifest at '$path' — appends " +
          "extend a COMPLETE document store (build with mode " +
          "create/overwrite first)"))
    val compactingP = new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")
    val appendingP = new org.apache.hadoop.fs.Path(s"$path/_APPENDING")
    graft.engine.LayoutFs.acquireMarker(fs, appendingP, compactingP,
      refuseOpposite =
        s"index sink (append): a compaction is rewriting table files " +
          s"at '$path' (${compactingP.getName} exists) — rows appended " +
          "now could be deleted by its swap (single-maintenance-writer " +
          "contract); wait for it to finish, or delete the marker if " +
          "it crashed mid-run",
      refuseOwn =
        s"index sink (append): another append is already running at " +
          s"'$path' (${appendingP.getName} exists) — wait for it to " +
          "finish, or delete the marker if it crashed mid-run")
    try {
      val stagedDocs = new org.apache.hadoop.fs.Path(s"$path/docs_append")
      val stagedPost =
        new org.apache.hadoop.fs.Path(s"$path/postings_append")
      fs.delete(stagedDocs, true) // a crashed previous append's
      fs.delete(stagedPost, true) // leftovers
      withId.write.mode("overwrite").parquet(stagedDocs.toString)
      // derive postings from the STAGED docs: one source of truth,
      // and the batch frame is computed once
      val stagedDf = spark.read.parquet(stagedDocs.toString)
      stagedDf.select(col("_id"),
          explode(array_distinct(col(analyzedCol))).as("token"))
        .write.mode("overwrite").parquet(stagedPost.toString)
      val n = stagedDf.count() // footer count of the staged batch
      val marks = readIndexedMarks(spark, path)
      // carried, not collected: grace collection is the compact
      // entry's job; an append mid-grace keeps excluding the purge's
      // replaced files. Totals re-read fresh under the marker.
      val dead = readIndexedDead(spark, path)
      val (rowsNow, versionNow) =
        readIndexedManifest(spark, path).getOrElse((rows0, version0))
      fs.delete(indexedManifestFile(path), false)
      Seq(("docs", stagedDocs), ("postings", stagedPost)).foreach {
        case (table, stagedP) =>
          fs.listStatus(stagedP).toSeq
            .filter(st => st.isFile &&
              st.getPath.getName.endsWith(".parquet"))
            .foreach { st =>
              fs.rename(st.getPath,
                new org.apache.hadoop.fs.Path(
                  s"$path/$table/${st.getPath.getName}"))
            }
          fs.delete(stagedP, true)
      }
      writeIndexedManifest(spark, path, rowsNow + n, versionNow + 1,
        marks ++ markUpdate, dead = dead)
    } finally { fs.delete(appendingP, false); () }
  }

  /** DELETE for the document store — the takedown verb on the THIRD
    * persisted artifact (the ANN index and the near-dup band index
    * grew it this round): tombstoned `_id`s append to a tiny
    * `deletes/` table and every reader of the layout suppresses them
    * ([[Sources.indexedTable]] — the recipe `index` dataset read, the
    * match step's right side through it, and the API `_search`
    * route). Physical purge at the next rebuild (mode
    * create/overwrite rewrites both tables and clears the
    * tombstones); a delete itself never rewrites — O(ids), safe
    * beside readers and appends. Idempotent; unknown ids are
    * legal. */
  def deleteFromIndexed(ids: DataFrame, idCol: String,
      path: String): Unit = {
    val spark = ids.sparkSession
    readIndexedManifestPatient(spark, path).getOrElse(sys.error(
      s"deleteFromIndexed: no store manifest at '$path' — deletes " +
        "tombstone rows of a COMPLETE document store (build with the " +
        "index sink first)"))
    val idType = spark.read.parquet(s"$path/docs").schema("_id").dataType
    ids.select(col(idCol).cast(idType).as("_id"))
      .filter(col("_id").isNotNull).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$path/deletes")
  }

  /** COMPACT for the document store — the physical tombstone purge
    * ([[graft.dedup.Dedup.compactNearDupIndex]]'s sibling, same
    * FILE-scoped shape): locate the docs/ and postings/ files actually
    * holding a tombstoned `_id` (an id-and-path-only scan over
    * `_metadata.file_path`), rewrite only those files' survivors, swap
    * them in, consume the tombstone snapshot — untouched files are
    * never read nor rewritten, so a bounded takedown against a 100-TB
    * store costs O(touched files), not O(store). Tombstone files are
    * snapshotted at entry: a delete landing mid-purge survives to the
    * next one, still suppressed by [[Sources.indexedTable]] meanwhile.
    *
    * READER-ATOMIC behind the manifest certificate (r14 verdict #1 —
    * this compact serves a live HTTP route, `_search`, where a
    * "maintenance window" is someone else's query): survivors stage
    * FIRST with the certificate intact (the long part — concurrent
    * reads keep working), then the manifest is retracted only for the
    * file swap and re-issued with the purged total, so a read landing
    * inside the window waits on the patient manifest read
    * ([[Sources.indexedTable]]) instead of transiently missing docs,
    * while a crash mid-swap leaves a loudly-unreadable store, never a
    * silent half-purge. Tombstones are consumed only after the
    * re-issue (a crash before that leaves them standing — still
    * suppressed read-side, re-purged idempotently). Excludes
    * concurrent appends via the shared atomic markers.
    *
    * Returns the count of tombstone-matched docs physically purged —
    * 0 when nothing matched — so compliance receipts (the YAML
    * takedown/compact surface) can record the purge; the count rides
    * the purge's existing docs-side job, no extra scan. */
  def compactIndexed(spark: SparkSession, path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delDir = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val delFiles: Seq[org.apache.hadoop.fs.Path] =
      if (!fs.exists(delDir)) Nil
      else fs.listStatus(delDir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    if (delFiles.isEmpty) {
      // nothing to purge — still a maintenance ENTRY: collect a
      // previous purge's dead-file grace (marker-guarded; silently
      // deferred if a writer holds the store)
      collectIndexedDeadStandalone(spark, fs, path)
      if (fs.exists(delDir)) { fs.delete(delDir, true); () }
      return 0L
    }
    val (rows0, version0) =
      readIndexedManifest(spark, path).getOrElse(sys.error(
        s"compactIndexed: no store manifest at '$path' — nothing " +
          "certified to compact; rebuild with the index sink"))
    val appendingP = new org.apache.hadoop.fs.Path(s"$path/_APPENDING")
    val compactingP = new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")
    graft.engine.LayoutFs.acquireMarker(fs, compactingP, appendingP,
      refuseOpposite =
        s"compactIndexed: an append is running at '$path' " +
          s"(${appendingP.getName} exists) — its freshly appended files " +
          "could be deleted by this purge's swap (single-maintenance-" +
          "writer contract); wait for it to finish, or delete the " +
          "marker if it crashed mid-run",
      refuseOwn =
        s"compactIndexed: another compaction is already running at " +
          s"'$path' (${compactingP.getName} exists) — wait for it to " +
          "finish, or delete the marker if it crashed mid-run")
    try {
      // DEAD-FILE GRACE COLLECTION (r15): a previous purge's replaced
      // files, kept on disk for readers whose listing predated it,
      // are physically collected here — one maintenance cycle later,
      // under the marker. Fresh totals re-read for the same reason.
      readIndexedDead(spark, path).foreach { case (table, names) =>
        names.foreach { n =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/$table/$n"),
            false)
        }
      }
      val (rowsF, versionF) =
        readIndexedManifest(spark, path).getOrElse((rows0, version0))
      val dels = spark.read.parquet(delFiles.map(_.toString): _*)
        .select(col("_id").as("__del_id")).distinct()
      def doomedFiles(table: String): Seq[String] =
        spark.read.parquet(s"$path/$table")
          .select(col("_id"), col("_metadata.file_path").as("__f"))
          .join(broadcast(dels), col("_id") === col("__del_id"), "left_semi")
          .select("__f").distinct().collect().map(_.getString(0)).toSeq
      // stage every touched file's survivors FIRST (the long part,
      // certificate intact); the retraction window below covers only
      // the file moves
      var purgedDocs = 0L
      val staged = Seq("docs", "postings").map { table =>
        val files = doomedFiles(table)
        val stagedP = new org.apache.hadoop.fs.Path(s"$path/${table}_compact")
        fs.delete(stagedP, true) // a crashed previous purge's leftover
        if (files.nonEmpty) {
          val touched = spark.read.parquet(files: _*)
          if (table == "docs")
            purgedDocs = touched
              .join(broadcast(dels), col("_id") === col("__del_id"),
                "left_semi").count()
          touched
            .join(broadcast(dels), col("_id") === col("__del_id"), "left_anti")
            .write.mode("overwrite").parquet(stagedP.toString)
        }
        (table, files, stagedP)
      }
      if (staged.forall(_._2.isEmpty)) {
        // tombstones matching nothing: consume the snapshot files
        delFiles.foreach(f => fs.delete(f, false))
      } else {
        val marks = readIndexedMarks(spark, path) // carried through
        fs.delete(indexedManifestFile(path), false)
        staged.foreach { case (table, files, stagedP) =>
          if (files.nonEmpty) {
            fs.listStatus(stagedP).toSeq
              .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
              .foreach { st =>
                fs.rename(st.getPath,
                  new org.apache.hadoop.fs.Path(
                    s"$path/$table/${st.getPath.getName}"))
              }
          }
          fs.delete(stagedP, true)
        }
        // the replaced files are NOT deleted: they enter the dead-file
        // grace list (r15) — a `_search` whose listing predates this
        // purge finishes against intact files (its eager tombstone
        // snapshot keeps it exact), every later read excludes them,
        // and the next maintenance entry collects them physically
        val deadNow: Map[String, Seq[String]] = staged.collect {
          case (table, files, _) if files.nonEmpty =>
            table -> files.map(f =>
              new org.apache.hadoop.fs.Path(f).getName)
        }.toMap
        writeIndexedManifest(spark, path, rowsF - purgedDocs,
          versionF + 1, marks, dead = deadNow)
        delFiles.foreach(f => fs.delete(f, false))
      }
      if (fs.exists(delDir) && !fs.listStatus(delDir).exists(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))) {
        fs.delete(delDir, true); ()
      }
      purgedDocs
    } finally { fs.delete(compactingP, false); () }
  }

  /** Dead-file grace collection for a maintenance entry with no other
    * work ([[compactIndexed]]'s early return): acquires the
    * `_COMPACTING` marker just for the collection (a concurrent
    * writer defers it — opportunistic hygiene, never worth failing a
    * no-op compact over), deletes the manifest's dead files, and
    * re-issues the certificate with the list cleared. */
  private def collectIndexedDeadStandalone(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val dead = readIndexedDead(spark, path)
    if (dead.forall(_._2.isEmpty)) return
    val appendingP = new org.apache.hadoop.fs.Path(s"$path/_APPENDING")
    val compactingP = new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")
    try graft.engine.LayoutFs.acquireMarker(fs, compactingP, appendingP,
      refuseOpposite = "busy", refuseOwn = "busy")
    catch { case _: IllegalArgumentException => return }
    try {
      readIndexedManifest(spark, path).foreach { case (rows, version) =>
        dead.foreach { case (table, names) =>
          names.foreach { n =>
            fs.delete(
              new org.apache.hadoop.fs.Path(s"$path/$table/$n"), false)
          }
        }
        val marks = readIndexedMarks(spark, path)
        fs.delete(indexedManifestFile(path), false)
        writeIndexedManifest(spark, path, rows, version + 1, marks)
      }
    } finally { fs.delete(compactingP, false); () }
  }

  /** Auto-purge policy for the document store, checked by the YAML
    * `index` delete mode: purge when the tombstone backlog reaches
    * `afterDeletes` rows (an O(tombstones) count) or `afterDeletesPct`
    * — tombstones ≥ X% of the MANIFEST-certified total, free to check
    * now that the store carries a certificate (r14 verdict #1: the
    * missing certified total was what forced this policy to the
    * absolute knob only). Defers (returns false) under a live
    * maintenance marker — this check rides YAML delete boundaries.
    * Returns true when a purge ran. */
  def maybeCompactIndexed(spark: SparkSession, path: String,
      afterDeletes: Option[Long],
      afterDeletesPct: Option[Double] = None): Boolean = {
    if (afterDeletes.isEmpty && afterDeletesPct.isEmpty) return false
    afterDeletes.foreach(n => require(n >= 1,
      s"purge_after_deletes must be >= 1, got $n"))
    afterDeletesPct.foreach(p => require(p > 0,
      s"purge_after_deletes_pct must be > 0, got $p"))
    val markerFs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (markerFs.exists(new org.apache.hadoop.fs.Path(s"$path/_APPENDING")) ||
        markerFs.exists(new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")))
      return false
    val delP = new org.apache.hadoop.fs.Path(s"$path/deletes")
    // hasVisibleParquetFile, not exists: a deletes/ dir holding only a
    // crashed write's husks must read as "no backlog", not crash the
    // YAML delete boundary on schema inference (r14 advice)
    if (!graft.engine.LayoutFs.hasVisibleParquetFile(
        delP.getFileSystem(spark.sparkContext.hadoopConfiguration), delP))
      return false
    val nDel = spark.read.parquet(delP.toString).count()
    val hit = nDel > 0 && (afterDeletes.exists(nDel >= _) ||
      afterDeletesPct.exists { pct =>
        val total = readIndexedManifest(spark, path).map(_._1).getOrElse(0L)
        total > 0 && nDel * 100.0 >= pct * total
      })
    if (hit) compactIndexed(spark, path)
    hit
  }
}
