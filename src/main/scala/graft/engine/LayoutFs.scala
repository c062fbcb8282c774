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
