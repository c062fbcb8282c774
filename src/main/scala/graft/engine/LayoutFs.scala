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
