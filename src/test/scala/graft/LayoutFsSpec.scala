package graft

import org.apache.hadoop.fs.Path
import graft.engine.LayoutFs

/** The single-maintenance-writer marker primitive (r14 verdict #1):
  * the old check-then-create shape let two writers launched in the
  * same instant each pass the other's check before either marker
  * landed. [[LayoutFs.acquireMarker]] closes it with create-if-absent
  * plus a post-create re-check; these specs drive the exact
  * lands-between-check-and-create interleave deterministically (an
  * exists() wrapper plants the opposing marker inside the window) —
  * the artifact-level refusals ride the same primitive
  * (GraphDedupSpec drives them through the real append/compact
  * verbs on both index pairs). */
class LayoutFsSpec extends SparkSpec {

  private def rawFs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("acquireMarker backs out when the opposite marker lands between " +
      "the pre-check and the create") {
    val dir = scratch("marker-interleave")
    val raw = rawFs(dir)
    val own = new Path(s"$dir/_APPENDING")
    val opposite = new Path(s"$dir/_COMPACTING")
    // the racing writer's create wins INSIDE our check-to-create
    // window: the first exists(opposite) call (our pre-check) reports
    // "absent" but plants the marker before returning — exactly the
    // interleave the r14 verdict flagged
    val fs = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      private var first = true
      override def exists(p: Path): Boolean =
        if (first && p == opposite) {
          first = false
          raw.create(opposite, false).close()
          false
        } else super.exists(p)
    }
    val e = intercept[IllegalArgumentException] {
      LayoutFs.acquireMarker(fs, own, opposite,
        refuseOpposite = "OPPOSITE-WRITER-RUNNING",
        refuseOwn = "OWN-ALREADY-HELD")
    }
    assert(e.getMessage.contains("OPPOSITE-WRITER-RUNNING"), e.getMessage)
    // the back-out must not leave our marker wedging BOTH sides shut
    assert(!raw.exists(own), "the backed-out writer left its own marker")
    assert(raw.exists(opposite), "the winning writer's marker vanished")
    raw.delete(opposite, false)
  }

  test("acquireMarker is create-if-absent: a second same-verb writer " +
      "refuses while the first holds the marker") {
    val dir = scratch("marker-sameverb")
    val raw = rawFs(dir)
    val own = new Path(s"$dir/_APPENDING")
    val opposite = new Path(s"$dir/_COMPACTING")
    LayoutFs.acquireMarker(raw, own, opposite, "opp", "OWN-HELD")
    assert(raw.exists(own))
    // second acquisition of the SAME marker fails the atomic create
    // (the old overwrite=true create silently shared it, and the
    // first finisher deleted it out from under the second)
    val e = intercept[IllegalArgumentException] {
      LayoutFs.acquireMarker(raw, own, opposite, "opp", "OWN-HELD")
    }
    assert(e.getMessage.contains("OWN-HELD"), e.getMessage)
    assert(raw.exists(own), "the refused writer deleted the holder's marker")
    // release → re-acquire works
    raw.delete(own, false)
    LayoutFs.acquireMarker(raw, own, opposite, "opp", "OWN-HELD")
    assert(raw.exists(own))
    raw.delete(own, false)
  }

  test("acquireMarker pre-check refuses on a standing opposite marker " +
      "without landing its own") {
    val dir = scratch("marker-precheck")
    val raw = rawFs(dir)
    val own = new Path(s"$dir/_COMPACTING")
    val opposite = new Path(s"$dir/_APPENDING")
    raw.create(opposite, false).close()
    val e = intercept[IllegalArgumentException] {
      LayoutFs.acquireMarker(raw, own, opposite, "APPEND-RUNNING", "own")
    }
    assert(e.getMessage.contains("APPEND-RUNNING"), e.getMessage)
    assert(!raw.exists(own))
    raw.delete(opposite, false)
  }
}
