package graft.engine

/** Filesystem helpers shared by the persisted-index layouts (the ANN
  * index in [[graft.sim.Ann]], the near-dup band index in
  * [[graft.dedup.Dedup]]) — hoisted so Spark's file-visibility rule
  * and the certificate-retraction retry exist ONCE instead of
  * drifting per module. */
object LayoutFs {

  /** Does `p` hold at least one VISIBLE parquet data file — Spark's
    * own partition-discovery rule: '_'/'.'-prefixed names are hidden
    * UNLESS they contain '=' (partition dirs like `__cell=3`)? A
    * kill-mid-write remnant dir holding only staging husks must read
    * as "no data", not send a union reader into schema-inference
    * crashes. */
  def hasVisibleParquetFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean = {
    def visible(n: String) =
      (!n.startsWith("_") && !n.startsWith(".")) || n.contains("=")
    def walk(d: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(d).exists { st =>
        val n = st.getPath.getName
        if (st.isDirectory) visible(n) && walk(st.getPath)
        else visible(n) && n.endsWith(".parquet")
      }
    fs.exists(p) && walk(p)
  }

  /** Acquire one side of the single-maintenance-writer contract
    * ATOMICALLY (r14 verdict "what's wrong" #1): the old shape —
    * check the opposite marker, then `create(own, overwrite=true)` —
    * let two writers launched in the same instant each pass the
    * other's check before either marker landed, reproducing exactly
    * the lost-rows interleave the markers exist to prevent.
    *
    * Three steps close every interleave: (1) pre-check the opposite
    * marker (the common-case refusal, cheap); (2) land OUR marker
    * with create-if-absent semantics — a second same-verb writer
    * fails the create and refuses (two appends racing the same index
    * were never safe either); (3) RE-check the opposite marker now
    * that ours is visible — if both writers raced past step 1, each
    * one's step-3 sees the other's marker, so at least one (possibly
    * both — safe, both refuse and can retry) backs out by deleting
    * its own marker and refusing. A marker left by a CRASHED run
    * blocks acquisition until deleted by hand; every refusal names
    * the marker file (the torn-manifest loud-refusal style).
    *
    * Returns normally holding the marker; the caller releases it in
    * a `finally` with `fs.delete(own, false)`. */
  def acquireMarker(fs: org.apache.hadoop.fs.FileSystem,
      own: org.apache.hadoop.fs.Path,
      opposite: org.apache.hadoop.fs.Path,
      refuseOpposite: => String, refuseOwn: => String): Unit = {
    require(!fs.exists(opposite), refuseOpposite)
    val created =
      try { fs.create(own, false).close(); true }
      catch { case _: java.io.IOException => false }
    require(created, refuseOwn)
    if (fs.exists(opposite)) {
      fs.delete(own, false)
      throw new IllegalArgumentException(
        "requirement failed: " + refuseOpposite)
    }
  }

  /** Run `body` (an index opener's listing + snapshot work) inside a
    * VERSION-STABLE bracket: the artifact's manifest version is read
    * patiently before and after, and `body`'s result is kept only when
    * the two reads agree — a maintenance re-issue between them means a
    * swap may have interleaved the listing (a fold or purge renaming
    * staged files in while the reader lists the directory would hand
    * it old AND new copies of the same rows), so the whole open
    * retries against the new state. The two version reads are
    * tiny-file reads; the common case (no maintenance running) pays
    * one extra manifest open per table open and never loops.
    *
    * A `FileNotFoundException` from `body` retries the same way: it
    * means a maintenance verb collected a file between the listing
    * and an eager read inside the bracket — by construction the next
    * attempt reads the re-issued state. Bounded: an index under
    * genuinely continuous maintenance churn fails loudly after
    * `attempts` tries instead of spinning. */
  def consistentSnapshot[A](what: String, version: => Option[Long],
      attempts: Int = 20)(body: => A): A = {
    var tries = 0
    while (true) {
      tries += 1
      val v1 = patiently(version)
      val out =
        try Some(body)
        catch {
          // retry only when a certificate EXISTED going in — with no
          // manifest nothing is mid-swap, so the body's own loud
          // refusal (missing dir, incomplete build) must propagate
          // with its precise message
          case t: Throwable
              if v1.isDefined && tries < attempts && fileVanished(t) =>
            None
        }
      if (out.isDefined && patiently(version) == v1)
        return out.get
      if (tries >= attempts)
        sys.error(s"$what: the manifest version moved on every one of " +
          s"$attempts open attempts — continuous maintenance churn? " +
          "pause maintenance or retry later")
    }
    sys.error("unreachable")
  }

  /** Did a file vanish under `t`'s computation? Spark wraps the
    * executor-side `FileNotFoundException` in SparkException
    * (FAILED_READ_FILE) and a vanished directory surfaces as an
    * AnalysisException (PATH_NOT_FOUND), so the snapshot bracket's
    * retry predicate walks the cause chain and the message. */
  private def fileVanished(t: Throwable): Boolean = {
    var c: Throwable = t
    var depth = 0
    while (c != null && depth < 10) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = Option(c.getMessage).getOrElse("")
      if (m.contains("FAILED_READ_FILE") || m.contains("PATH_NOT_FOUND") ||
          m.contains("FileNotFoundException")) return true
      c = c.getCause
      depth += 1
    }
    false
  }

  /** Serialize a per-table dead-file grace list for a manifest
    * certificate — `{"table": ["name", ...], ...}`. Names come from
    * our own directory listings (Spark part-file names, or
    * `__cell=N/name` relatives) and are REQUIRED to stay in that
    * shape: a name that could smuggle JSON through the reader's regex
    * refuses loudly instead of corrupting the certificate. */
  def deadFilesJson(dead: Map[String, Seq[String]]): String =
    dead.toSeq.sortBy(_._1).map { case (table, names) =>
      names.foreach { n =>
        require(n.matches("""[-._a-zA-Z0-9=/]+"""),
          s"dead-file name '$n' is not a plain part-file path — " +
            "refusing to certify it")
      }
      s""""$table": ${names.sorted.map(n => s""""$n"""").mkString("[", ", ", "]")}"""
    }.mkString("{", ", ", "}")

  /** Parse [[deadFilesJson]] back out of a manifest's text. Absent
    * key (pre-grace manifests) reads as empty. */
  def parseDeadFiles(manifestTxt: String): Map[String, Seq[String]] =
    """"dead_files":\s*\{(.*?)\}""".r.findFirstMatchIn(manifestTxt)
      .map(_.group(1)) match {
        case None => Map.empty
        case Some(body) =>
          """"(\w+)":\s*\[([^\]]*)\]""".r.findAllMatchIn(body).map { m =>
            m.group(1) ->
              """"([^"]+)"""".r.findAllMatchIn(m.group(2))
                .map(_.group(1)).toSeq
          }.toMap
      }

  /** Re-run `read` with a SHORT bounded retry while it returns None: a
    * compaction retracts its manifest certificate for a narrow swap
    * window, and a live probe or stream batch landing inside it must
    * ride it out — while a PERMANENT absence (crashed build, rebuild
    * in progress) still returns None after the ~1 s budget, preserving
    * the loud-refusal contract one level up. */
  def patiently[T](read: => Option[T]): Option[T] = {
    var attempt = 0
    var out = read
    while (out.isEmpty && attempt < 4) {
      Thread.sleep(250); attempt += 1
      out = read
    }
    out
  }
}
