package graft

import org.apache.spark.sql.functions._
import graft.graph.ConnectedComponents
import graft.dedup.Dedup
import graft.text.TextAnalysis
import graft.sim.Ann
import graft.operators.MatchJoin
import graft.functions.Tools

class GraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels each component with its min id") {
    // components: {1,2,3,4} (chain), {10,11}, {20} isolated via self-edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L)).toDF("src", "dst")
    val out = ConnectedComponents.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("star-contraction CC agrees with min-label propagation (incl. deep chains)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // a long chain (diameter 120) + random edges + 2-node + isolated-self
    val chain = (0L until 120L).map(i => (i, i + 1))
    val random = (1 to 150).map(_ => (rnd.nextInt(80) + 200L, rnd.nextInt(80) + 200L))
    val extras = Seq((500L, 501L), (600L, 600L))
    val edges = (chain ++ random ++ extras).toDF("src", "dst")
    val a = ConnectedComponents.run(edges, maxIter = 200).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ConnectedComponents.runStarContraction(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"mismatch: ${a.toSet.diff(b.toSet).take(5)} vs ${b.toSet.diff(a.toSet).take(5)}")
    assert(b(120L) == 0L) // chain collapses to its min
    assert(b(501L) == 500L)
  }

  test("dedup treats NULL-text rows as unique, never as duplicates of each other") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, null), (4L, null), (5L, ""))
      .toDF("id", "text")
    // exact: the two "same" rows collapse to id 1; BOTH null rows and the
    // empty-string row survive
    val kept = Dedup.exactDedup(df, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
    // fingerprint: null -> NULL key (not md5("") colliding with empties)
    val fps = df.select(col("id"), Dedup.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fps(3L).isEmpty && fps(4L).isEmpty)
    assert(fps(5L).isDefined)
    val fkept = Dedup.fingerprintDedup(df, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(fkept == Set(1L, 3L, 4L, 5L))
  }

  test("star-contraction CC handles STRING ids (no silent long cast)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val out = ConnectedComponents.runStarContraction(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("graph metrics refuse string ids loudly (GraphX needs long vertex ids)") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      graft.graph.GraphMetrics.metrics(edges, Seq("degree"))
    }
    assert(e.getMessage.contains("NUMERIC node ids"), e.getMessage)
  }

  test("LSH near-dup at bits=64 buckets on the full signature, not a degenerate mask") {
    // before the mask fix, (1L << 64) - 1 overflowed to 0: every row in
    // bucket 0 and orthogonal vectors became candidate pairs
    val vs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(1f, 0f, 0f, 0f)),
      (3L, Seq(-1f, 0f, 0f, 0f)), (4L, Seq(0f, -1f, 0f, 0f)))
      .toDF("id", "v")
    val pairs = Ann.cosineNearDupsLSH(vs, "id", "v",
        threshold = 0.9, bits = 64, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs") // only the identical pair
  }

  test("clique op attaches graph_clique_id and size (recipes.py:2040-2055)") {
    val df = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = ConnectedComponents.clique(df, "a", "b")
    val m = out.collect().map(r =>
      r.getAs[Long]("a") -> (r.getAs[Long]("graph_clique_id"), r.getAs[Long]("graph_clique_size"))).toMap
    assert(m(1L) == (1L, 3L) && m(2L) == (1L, 3L) && m(10L) == (10L, 2L))
  }

  test("exact dedup keeps min id per identical text") {
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
    assert(col1[Long](out, "doc_id").sorted == Seq(1L, 2L))
  }

  test("exact dedup drops NULL-id rows in keyed groups (the min/semi-join contract)") {
    // the pre-r15 groupBy(min id) + semi-join shape dropped NULL-id
    // rows inside a keyed group (min ignores NULLs; NULL never
    // equi-joins) and erased all-NULL-id groups entirely — the window
    // rewrite must reproduce that, not rank a NULL id first
    // (asc_nulls_first would keep (null,"same") and evict id 1)
    val df = Seq[(java.lang.Long, String)](
      (3L, "same"), (null, "same"), (1L, "same"),   // mixed group
      (null, "ghost"), (null, "ghost"),             // all-NULL-id group
      (2L, "other"),                                // singleton
      (null, null)                                  // NULL key: always kept
    ).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out.sortBy(_.getOrElse(Long.MinValue)) ==
      Seq(None, Some(1L), Some(2L)), s"got $out")
  }

  test("embedding dedup keeps min id per semantic cluster, leaves distinct vectors") {
    // group {5,1,9} shares one vector (transitive via identical pairs);
    // 2 and 3 are distinct directions; 4 is NEAR 2 (cos ≈ 0.999) but
    // below the 0.9999 threshold — must survive
    val shared = Seq(1f, 0f, 0f, 0f)
    val df = Seq(
      (5L, shared), (1L, shared), (9L, shared),
      (2L, Seq(0f, 1f, 0f, 0f)), (3L, Seq(0f, 0f, 1f, 0f)),
      (4L, Seq(0.045f, 0.999f, 0f, 0f)))
      .toDF("id", "v")
    val out = Dedup.embeddingDedup(df, "id", "v",
      threshold = 0.9999, bits = 12, tables = 4)
    assert(col1[Long](out, "id").sorted == Seq(1L, 2L, 3L, 4L))
    // at 0.99 the near pair (2,4) now clusters too — 2 survives as min
    val loose = Dedup.embeddingDedup(df, "id", "v",
      threshold = 0.99, bits = 12, tables = 4)
    assert(col1[Long](loose, "id").sorted == Seq(1L, 2L, 3L))
  }

  test("fingerprint collapses case/punctuation/word-order variants") {
    val df = Seq("Hello, World!", "world HELLO", "different").toDF("t")
    val fps = col1[String](df.select(Dedup.fingerprint(col("t")).as("f")), "f")
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("minhash LSH finds planted near-duplicates") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val near = base.replace("today", "tonight")
    val other = "completely different content about spark dataframes and shuffles here now"
    val df = Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text",
      shingleSize = 2, numHashes = 32, bands = 16, threshold = 0.5)
    val got = pairs.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("simhash: identical token sets → distance 0; near → small distance") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text")
    // wide bands (2-bit keys) to observe distances up to 16 while
    // keeping the pigeonhole guarantee maxHamming < bands
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", maxHamming = 16, bands = 32)
    val m = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m((1L, 2L)) == 0)
    assert(m.get((1L, 3L)).forall(_ > 0))
  }

  test("simhash banding is total-recall within the pigeonhole bound (vs brute force)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all pairs with hamming(sig) <= 3, no banding
    val sig = docs.select(col("doc_id").as("id"),
      Dedup.simhash64(graft.functions.Tools.tokenize(
        graft.functions.Tools.normalize(col("text")))).as("sig"))
    val a = sig.select(col("id").as("id_a"), col("sig").as("sa"))
    val b = sig.select(col("id").as("id_b"), col("sig").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(Dedup.hamming64(col("sa"), col("sb")) <= 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, s"banding missed ${(brute -- banded).size} pairs")
    assert(brute.nonEmpty) // the check is vacuous if nothing is near
    // and the guarantee is enforced: over-bound maxHamming is rejected
    val e = intercept[IllegalArgumentException](
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 10))
    assert(e.getMessage.contains("banding recall guarantee"))
  }

  test("LSH cosine near-dups recall planted high-cosine pairs without a block key") {
    import graft.sim.Ann
    // planted corpus: 60 random unit-ish vectors plus a perturbed copy
    // of every 4th one (cosine ≈ 0.999) — no blocking key exists, so
    // the bucketed operator is the only non-quadratic way to find them
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (i, v) =>
      (1000L + i, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val brute = Ann.cosineNearDups(
        emb.withColumn("block", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", "block", threshold = 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.cosineNearDupsLSH(emb, "vec_id", "embedding",
        threshold = 0.98, bits = 8, tables = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 15) // the 15 planted pairs all exceed 0.98
    assert(lsh.subsetOf(brute)) // no false positives: exact cosine verifies
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall too low (${lsh.size}/${brute.size})")
    // the signature is a single 64-bit word: bits*tables beyond 64 would
    // silently alias through shift-mod-64 and share bits across tables —
    // must fail loudly instead (YAML exposes both knobs)
    val e = intercept[IllegalArgumentException](
      Ann.cosineNearDupsLSH(emb, "vec_id", "embedding",
        threshold = 0.98, bits = 16, tables = 5))
    assert(e.getMessage.contains("64"))
  }

  test("brute-force ANN ranks by cosine with id tie-break") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(df.filter($"vec_id" === 0), df,
      "vec_id", "embedding", "vec_id", "embedding", k = 2)
    val got = out.orderBy("rank").collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(got.toSeq == Seq((3L, 1), (1L, 2)))
  }

  test("ANN: duplicate query rows collapse to one query identity") {
    // a twice-ingested query batch (routine dedup-library input) must
    // not double candidates and burn top-k slots on repeated pairs
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val dupQ = df.filter($"vec_id" === 0).unionByName(df.filter($"vec_id" === 0))
    val brute = Ann.bruteForceTopK(dupQ, df,
      "vec_id", "embedding", "vec_id", "embedding", k = 2)
    assert(brute.count() == 2, "dup query ids doubled the brute-force top-k")
    assert(brute.select("neighbor_id").distinct().count() == 2)
    val lsh = Ann.lshTopK(dupQ, df,
      "vec_id", "embedding", "vec_id", "embedding", k = 2)
    assert(lsh.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).isEmpty, "dup query ids duplicated LSH pairs")
  }

  test("IVF ANN recalls the brute-force top-k on the driver embeddings") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val exact = Ann.bruteForceTopK(q, e, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
    val ivf = Ann.ivfTopK(q, e, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 4)
      .select("query_id", "neighbor_id")
    val nExact = exact.count()
    val recalled = exact.intersect(ivf).count()
    // probing half the cells on random-ish vectors: expect solid recall
    assert(recalled.toDouble / nExact > 0.5,
      s"IVF recall too low: $recalled/$nExact")
    // every IVF hit ranks deterministically
    assert(ivf.count() > 0)

    // persisted index round trip: same seed and layout → identical
    // results to the in-memory path, across a fresh read
    val idxPath = scratch("graft-ivf")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxPath, nlist = 8)
    val fromIndex = Ann.ivfIndexTopK(spark, idxPath, q, "vec_id", "embedding",
        k = 5, nprobe = 4, excludeSelf = true)
      .select("query_id", "neighbor_id")
    assert(fromIndex.count() == ivf.count())
    assert(ivf.exceptAll(fromIndex).count() == 0,
      "persisted-index results diverge from the in-memory IVF path")
    // the assigned table is hive-partitioned by cell — the layout that
    // lets a probe read only its cells' directories
    val dirs = new java.io.File(s"$idxPath/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("__cell="))
    assert(dirs.length == 8, dirs.mkString(","))
    // and dynamic partition pruning actually fires on the probe join —
    // the scan of assigned/ carries a runtime __cell IN filter, so only
    // probed cell directories are read (the whole point of the layout)
    val p = fromIndex.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the assigned scan:\n$p")
    // a wrong path names itself instead of a bare parquet read error
    val e2 = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopK(spark, s"$idxPath/nope", q, "vec_id", "embedding", k = 2)
    }
    assert(e2.getMessage.contains("not a complete IVF index"), e2.getMessage)
    // torn-build guards (r8 VERDICT #7): the manifest is written LAST,
    // so (a) no manifest = build never completed → loud failure, and
    // (b) a manifest disagreeing with the centroid table = tables from
    // two different builds → loud failure, never a silent stale probe
    val mf = new java.io.File(s"$idxPath/_MANIFEST.json")
    val mfText = new String(java.nio.file.Files.readAllBytes(mf.toPath))
    assert(mf.delete())
    // drop the local-FS checksum shadow too — rewriting the manifest
    // out-of-band below would otherwise trip ChecksumException before
    // the torn-build require gets to speak
    new java.io.File(s"$idxPath/._MANIFEST.json.crc").delete()
    val e3 = intercept[IllegalStateException] {
      Ann.ivfIndexTopK(spark, idxPath, q, "vec_id", "embedding", k = 2)
    }
    assert(e3.getMessage.contains("no build manifest"), e3.getMessage)
    java.nio.file.Files.writeString(mf.toPath,
      mfText.replace("\"nlist\": 8", "\"nlist\": 4"))
    val e4 = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopK(spark, idxPath, q, "vec_id", "embedding", k = 2)
    }
    assert(e4.getMessage.contains("torn"), e4.getMessage)
  }

  test("int8 IVF index: exhaustive probe equals brute-force quantized; layouts refuse each other") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val idxQ = scratch("graft-ivfq")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxQ, nlist = 8,
      quantize = true)
    // exhaustive probe (nprobe = nlist) must EQUAL the brute-force
    // quantized answer — same codebook, same grid, same ranking
    val viaIndex = Ann.ivfIndexTopKQuantized(spark, idxQ, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    val qv = Ann.quantizeInt8(e, "embedding", Ann.int8Params(e, "embedding"))
    val direct = Ann.quantizedTopK(qv.filter(col("vec_id") % 100 === 0), qv,
      "vec_id", "qvec", "vec_id", "qvec", k = 5)
    assert(viaIndex.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaIndex).count() == 0,
      "quantized index probe diverges from brute-force quantized")
    // the index stores grids + codebook, never floats
    assert(new java.io.File(s"$idxQ/params").exists())
    assert(spark.read.parquet(s"$idxQ/assigned").columns.toSet ==
      Set("neighbor_id", "qvec", "__cell"))
    // layout checks are LOUD in both directions
    val eF = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopK(spark, idxQ, q, "vec_id", "embedding", k = 2)
    }
    assert(eF.getMessage.contains("QUANTIZED"), eF.getMessage)
    val idxF = scratch("graft-ivff")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxF, nlist = 8)
    val eQ = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopKQuantized(spark, idxF, q, "vec_id", "embedding", k = 2)
    }
    assert(eQ.getMessage.contains("FLOAT"), eQ.getMessage)
  }

  test("IVF-PQ index: exhaustive ADC probe equals brute-force PQ; planted duplicate; layouts refuse each other") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val idx = scratch("graft-ivfpq")
    Ann.writeIvfIndexPq(e, "vec_id", "embedding", idx, nlist = 8,
      m = 4, ksub = 8)
    // exhaustive probe (nprobe = nlist) must EQUAL the brute-force PQ
    // ranking — same codebooks (same corpus + seed), same codes, same
    // ADC arithmetic
    val viaIndex = Ann.ivfIndexTopKPq(spark, idx, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    val direct = Ann.pqTopK(q, e, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, m = 4, ksub = 8)
    assert(viaIndex.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaIndex).count() == 0,
      "IVF-PQ index probe diverges from brute-force PQ")
    // the index stores m-byte codes + the two codebook tables — never
    // vectors or grids
    assert(new java.io.File(s"$idx/pq").exists())
    assert(spark.read.parquet(s"$idx/assigned").columns.toSet ==
      Set("neighbor_id", "codes", "__cell"))
    assert(spark.read.parquet(s"$idx/pq").count() == 4 * 8)
    // a planted EXACT copy shares every code with its query, so its ADC
    // distance is the query-to-own-codeword floor: it must sit at the
    // rank-1 distance (another corpus vector may TIE by landing in the
    // same 4 codewords — ties break by id — so pin the distance, not
    // the id)
    val planted = q.select((col("vec_id") + 10000).as("vec_id"),
      col("embedding"))
    val withDup = Ann.pqTopK(q,
      e.select("vec_id", "embedding").unionByName(planted),
      "vec_id", "embedding", "vec_id", "embedding", k = 5, m = 4, ksub = 8)
    val best = withDup.filter(col("rank") === 1)
      .select(col("query_id"), col("d2pq").as("best_d2"))
    val dupRows = withDup
      .filter(col("neighbor_id") === col("query_id") + 10000)
      .join(best, Seq("query_id"))
    assert(dupRows.count() == q.count(),
      "a planted exact copy fell out of the PQ top-5")
    assert(dupRows.filter(col("d2pq") =!= col("best_d2")).isEmpty,
      "a planted exact copy ranked above some other vector's ADC floor")
    // NULL / malformed vectors encode to NULL codes, never a guess
    import spark.implicits._
    val cb = Ann.pqCodebooks(e, "vec_id", "embedding", m = 4, ksub = 8)
    val bad = Seq((1L, null.asInstanceOf[Array[Float]]),
        (2L, Array(0.1f, 0.2f))) // wrong dimension
      .toDF("vec_id", "embedding")
    val codes = Ann.encodePq(bad, "embedding", cb, "codes")
      .select("codes").collect()
    assert(codes.forall(_.isNullAt(0)),
      "malformed vectors must encode to NULL codes")
    // layout checks are LOUD in all directions
    val eF = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopK(spark, idx, q, "vec_id", "embedding", k = 2)
    }
    assert(eF.getMessage.contains("PRODUCT-QUANTIZED"), eF.getMessage)
    val eQ = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopKQuantized(spark, idx, q, "vec_id", "embedding", k = 2)
    }
    assert(eQ.getMessage.contains("PRODUCT-QUANTIZED"), eQ.getMessage)
    val idxF = scratch("graft-ivff2")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxF, nlist = 8)
    val ePq = intercept[IllegalArgumentException] {
      Ann.ivfIndexTopKPq(spark, idxF, q, "vec_id", "embedding", k = 2)
    }
    assert(ePq.getMessage.contains("FLOAT"), ePq.getMessage)
  }

  test("residual IVF-PQ: planted duplicate at the ADC floor; geometry recorded in the manifest; drift refused at append") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") % 100 === 0)
    val planted = q.select((col("vec_id") + 10000).as("vec_id"),
      col("embedding"))
    val corpus = e.unionByName(planted)
    val idx = scratch("graft-ivfpqr")
    Ann.writeIvfIndexPq(corpus, "vec_id", "embedding", idx, nlist = 4,
      m = 4, ksub = 8, residual = true)
    assert(Ann.readManifest(spark, idx).exists(m =>
      m.quant == 2 && m.pqRes == 1))
    // an exact copy lands in the same cell (same vector, same argmin),
    // has the same residual, hence the same codes — its ADC distance
    // is the query-to-own-codeword floor and must equal the rank-1
    // distance (ties by id can put a code-sharing vector first)
    val hits = Ann.ivfIndexTopKPq(spark, idx, q, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val best = hits.filter(col("rank") === 1)
      .select(col("query_id"), col("d2pq").as("best_d2"))
    val dup = hits.filter(col("neighbor_id") === col("query_id") + 10000)
      .join(best, Seq("query_id"))
    assert(dup.count() == q.count(),
      "a planted exact copy fell out of the residual-PQ top-5")
    assert(dup.filter(col("d2pq") =!= col("best_d2")).isEmpty,
      "a planted exact copy sat above the ADC floor")
    // the probe ranks ALL corpus rows when exhaustive — dense ranks
    val ranks = hits.groupBy("query_id")
      .agg(sort_array(collect_list(col("rank"))).as("rs"))
      .select("rs").collect()
    ranks.foreach { r =>
      val rs = r.getSeq[Int](0)
      assert(rs == (1 to rs.length), s"ranks not dense: $rs")
    }
    // appending under a dataset block that declares plain pq refuses —
    // raw-space and residual-space codes are incomparable geometries
    val conf = graft.conf.RecipeConf.load(
      s"""datasets:
         |  batch: {path: $idx/centroids, format: parquet}
         |  idxw:
         |    path: $idx
         |    format: ann_index
         |    options: {id: vec_id, vec: embedding, quantize: "pq"}
         |recipes:
         |  app: {input: batch, steps: [], output: idxw}
         |""".stripMargin)
    val eDrift = intercept[RuntimeException](
      graft.conf.RecipeConf.run(spark, conf, "app", mode = "append"))
    assert(eDrift.getMessage.contains("drifted"), eDrift.getMessage)
    // ... and so does a matching flavor with a drifted CODE geometry
    // (pq_ksub) — the knob the q133/q134 append gates declare; a
    // silently accepted mismatch would mix incompatible codebooks
    val confK = graft.conf.RecipeConf.load(
      s"""datasets:
         |  batch: {path: $idx/centroids, format: parquet}
         |  idxw:
         |    path: $idx
         |    format: ann_index
         |    options: {id: vec_id, vec: embedding, quantize: "pqr",
         |      pq_m: "2", pq_ksub: "16"}
         |recipes:
         |  app: {input: batch, steps: [], output: idxw}
         |""".stripMargin)
    val eK = intercept[RuntimeException](
      graft.conf.RecipeConf.run(spark, confK, "app", mode = "append"))
    assert(eK.getMessage.contains("drifted") &&
      (eK.getMessage.contains("pq_m") || eK.getMessage.contains("pq_ksub")),
      eK.getMessage)
  }

  test("appendIvfIndex: float append ≡ full rebuild; quantized batch lands on the ORIGINAL grid; version bumps; torn is loud") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val part1 = e.filter(col("vec_id") % 2 === 0)
    val part2 = e.filter(col("vec_id") % 2 =!= 0)
    val q = e.filter(col("vec_id") % 100 === 0)
    // FLOAT layout: an exhaustive probe reads true vectors, so the
    // coarse geometry cannot affect it — build-on-half + append must
    // hash-equal the full rebuild probed exhaustively
    val idxA = scratch("graft-ivf-app")
    Ann.writeIvfIndex(part1, "vec_id", "embedding", idxA, nlist = 8)
    Ann.appendIvfIndex(part2, "vec_id", "embedding", idxA)
    val idxB = scratch("graft-ivf-reb")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxB, nlist = 8)
    val viaAppend = Ann.ivfIndexTopK(spark, idxA, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    val viaRebuild = Ann.ivfIndexTopK(spark, idxB, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(viaAppend.exceptAll(viaRebuild).count() == 0 &&
      viaRebuild.exceptAll(viaAppend).count() == 0,
      "probe-after-append diverged from probe-after-rebuild")
    // manifest: full row count, version bumped past the build's 0
    val mfA = Ann.readManifest(spark, idxA).get
    assert(mfA.rows == e.count() && mfA.version == 1L, mfA.toString)
    // SQ8 layout: the appended batch must quantize under the ORIGINAL
    // params table (comparability across increments is the index
    // contract) — the reference is the brute-force quantized ranking
    // with EVERYTHING on part1's grid
    val idxQ = scratch("graft-ivfq-app")
    Ann.writeIvfIndex(part1, "vec_id", "embedding", idxQ, nlist = 8,
      quantize = true)
    Ann.appendIvfIndex(part2, "vec_id", "embedding", idxQ)
    val params1 = spark.read.parquet(s"$idxQ/params")
    val allOnGrid1 = Ann.quantizeInt8(e, "embedding", params1)
    val directQ = Ann.quantizedTopK(
      allOnGrid1.filter(col("vec_id") % 100 === 0), allOnGrid1,
      "vec_id", "qvec", "vec_id", "qvec", k = 5)
    val probeQ = Ann.ivfIndexTopKQuantized(spark, idxQ, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(probeQ.exceptAll(directQ).count() == 0 &&
      directQ.exceptAll(probeQ).count() == 0,
      "appended batch did not land on the original SQ8 grid")
    // appending to a dir with no manifest is loud — never a silent
    // half-index
    val bare = scratch("graft-ivf-bare")
    val eApp = intercept[RuntimeException](
      Ann.appendIvfIndex(part2, "vec_id", "embedding", bare))
    assert(eApp.getMessage.contains("manifest"), eApp.getMessage)
  }

  test("appendIvfIndexStream: streamed epochs probe alongside the built " +
      "table, a replay cannot duplicate, compaction folds them in, SQ8 " +
      "rows land on the stored grid") {
    import graft.streaming.EventStream
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val part1 = e.filter(col("vec_id") % 2 === 0)
    val part2 = e.filter(col("vec_id") % 2 =!= 0)
    val q = e.filter(col("vec_id") % 100 === 0)
    val inDir = scratch("ivfstr-in")
    part2.repartition(3).write.mode("overwrite").parquet(inDir)
    def runStream(idx: String, ckpt: String): Unit = {
      val sq = EventStream.appendIvfIndexStream(
        spark.readStream.schema(part2.schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir),
        idx, "vec_id", "embedding", checkpoint = ckpt)
      sq.processAllAvailable()
      assert(sq.recentProgress.count(_.numInputRows > 0) >= 2,
        "expected multiple micro-batches — the per-epoch accumulation " +
          "was not exercised")
      sq.stop()
    }
    // FLOAT: build on half, stream the rest in — the exhaustive probe
    // over built ∪ streamed must equal the full rebuild's
    val idx = scratch("ivfstr-f")
    Ann.writeIvfIndex(part1, "vec_id", "embedding", idx, nlist = 8)
    val ck1 = scratch("ivfstr-ck") + "/ck"
    runStream(idx, ck1)
    val idxFull = scratch("ivfstr-reb")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxFull, nlist = 8)
    val viaStream = Ann.ivfIndexTopK(spark, idx, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    val viaRebuild = Ann.ivfIndexTopK(spark, idxFull, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(viaStream.exceptAll(viaRebuild).count() == 0 &&
      viaRebuild.exceptAll(viaStream).count() == 0,
      "probe over built ∪ streamed diverged from the full rebuild")
    // plan quality: the union must not cost the layout its point —
    // dynamic partition pruning still fires on the probed cell join
    // (both union sides are hive-partitioned by __cell, and the
    // runtime __cell IN filter pushes through the union)
    val plan = Ann.ivfIndexTopK(spark, idx, q,
      "vec_id", "embedding", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the built ∪ streamed " +
        s"probe scan:\n$plan")
    // fresh-checkpoint guard: clearing the checkpoint but keeping the
    // index restarts epoch numbering into a stream/ history that
    // remembers this tag's epochs — refused at start (r13 review: the
    // sibling annProbeStream guard, applied to the accumulating sink)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ck1), true)
    val eFresh = intercept[RuntimeException](
      EventStream.appendIvfIndexStream(
        spark.readStream.schema(part2.schema).parquet(inDir),
        idx, "vec_id", "embedding", checkpoint = ck1))
    assert(eFresh.getMessage.contains("fresh"), eFresh.getMessage)
    // COMPACTION: fold stream/ into assigned/, probe unchanged,
    // manifest re-certified with the full count + a bumped version +
    // the folded tag's watermark
    Ann.compactIvfIndex(spark, idx)
    // the folded epoch dirs are RETAINED one fold cycle (r15 probe
    // grace) — marks make them probe-invisible; the NEXT fold's entry
    // collection removes them physically
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream")),
      "grace: the folded epochs should linger under the watermark")
    Ann.compactIvfIndex(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream")),
      "the second fold did not collect the graced epoch dirs")
    val viaCompacted = Ann.ivfIndexTopK(spark, idx, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(viaCompacted.exceptAll(viaRebuild).count() == 0 &&
      viaRebuild.exceptAll(viaCompacted).count() == 0,
      "compaction changed the probe answer")
    val mf = Ann.readManifest(spark, idx).get
    assert(mf.rows == e.count() && mf.version == 1L &&
      mf.streamMarks.nonEmpty, mf.toString)
    // REPLAY semantics on a dedicated mini-index, driving the exact
    // at-least-once cases through the per-batch body: (a) the same
    // (tag, epoch) twice → dynamic epoch-overwrite rewrites, never
    // doubles; (b) a FOLDED epoch's replay is skipped via the
    // manifest watermark (re-creating it would double rows the main
    // table now holds — the r13-review compaction/replay hole); (c) a
    // LATER epoch of the same tag still appends.
    val idx3 = scratch("ivfstr-replay")
    Ann.writeIvfIndex(part1, "vec_id", "embedding", idx3, nlist = 4)
    val pre3 = Ann.loadIndexGeometry(spark, idx3, "spec")
    val b = part2.limit(50)
    val bn = b.count()
    EventStream.appendIvfBatch(b, idx3, "vec_id", "embedding", "aa", 7, pre3)
    EventStream.appendIvfBatch(b, idx3, "vec_id", "embedding", "aa", 7, pre3)
    assert(spark.read.parquet(s"$idx3/stream").count() == bn,
      "a replayed epoch doubled its rows")
    Ann.compactIvfIndex(spark, idx3)
    val mf3 = Ann.readManifest(spark, idx3).get
    assert(mf3.streamMarks == Map("aa" -> 7L), mf3.toString)
    Ann.compactIvfIndex(spark, idx3) // collect the graced epoch dir
    EventStream.appendIvfBatch(b, idx3, "vec_id", "embedding", "aa", 7, pre3)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx3/stream")),
      "a folded epoch's replay resurrected rows already in assigned/")
    EventStream.appendIvfBatch(b, idx3, "vec_id", "embedding", "aa", 8, pre3)
    assert(spark.read.parquet(s"$idx3/stream").count() == bn,
      "a post-compaction epoch of the same tag must still append")
    // an EMPTY micro-batch writes nothing (no file-less epoch husk
    // that would crash the union read's schema inference)
    EventStream.appendIvfBatch(b.limit(0), idx3, "vec_id", "embedding",
      "aa", 9, pre3)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$idx3/stream/__stream=aa/__epoch=9")),
      "an empty micro-batch left an epoch husk")
    // a RESURRECTED epoch (a replay that raced a previous compaction
    // and re-created a dir at/below its tag's watermark) is swept by
    // the next compaction WITHOUT re-folding — folding it again would
    // make the transient double-count permanent in assigned/ (r13
    // review #3's other half)
    val base = spark.read.parquet(s"$idx3/assigned").count()
    spark.read.parquet(s"$idx3/assigned").limit(5)
      .write.mode("overwrite").partitionBy("__cell")
      .parquet(s"$idx3/stream/__stream=aa/__epoch=7")
    Ann.compactIvfIndex(spark, idx3)
    val mf4 = Ann.readManifest(spark, idx3).get
    assert(spark.read.parquet(s"$idx3/assigned").count() == base + bn,
      "compaction re-folded a resurrected epoch (or missed epoch 8)")
    assert(mf4.streamMarks == Map("aa" -> 8L), mf4.toString)
    // a non-alphanumeric tag would silently break its own watermark
    // round trip (manifest keys are sanitized on write) — refused
    val eTag = intercept[IllegalArgumentException](
      EventStream.appendIvfBatch(b, idx3, "vec_id", "embedding",
        "bad-tag", 0, pre3))
    assert(eTag.getMessage.contains("alphanumeric"), eTag.getMessage)
    // the LEGACY un-tagged stream layout refuses compaction loudly
    // (silently ignoring it would no-op forever while a resumed
    // stream writes the tagged layout beside it)
    spark.read.parquet(s"$idx3/assigned").limit(3)
      .write.mode("overwrite").partitionBy("__cell")
      .parquet(s"$idx3/stream/__epoch=0")
    val eLegacy = intercept[IllegalArgumentException](
      Ann.compactIvfIndex(spark, idx3))
    assert(eLegacy.getMessage.contains("legacy"), eLegacy.getMessage)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx3/stream"), true)
    // SQ8: streamed rows must encode under the ORIGINAL half-corpus
    // grid (the batch-append contract, via the shared
    // encodeUnderStoredGeometry) — reference = brute force with
    // EVERYTHING on part1's params
    val idxQ = scratch("ivfstr-q")
    Ann.writeIvfIndex(part1, "vec_id", "embedding", idxQ, nlist = 8,
      quantize = true)
    runStream(idxQ, scratch("ivfstr-ckq") + "/ck")
    val params1 = spark.read.parquet(s"$idxQ/params")
    val allOnGrid1 = Ann.quantizeInt8(e, "embedding", params1)
    val directQ = Ann.quantizedTopK(
      allOnGrid1.filter(col("vec_id") % 100 === 0), allOnGrid1,
      "vec_id", "qvec", "vec_id", "qvec", k = 5)
    val probeQ = Ann.ivfIndexTopKQuantized(spark, idxQ, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(probeQ.exceptAll(directQ).count() == 0 &&
      directQ.exceptAll(probeQ).count() == 0,
      "streamed batch did not land on the original SQ8 grid")
    // PQ: streamed rows must encode under the ORIGINAL per-subspace
    // codebooks. Reference = a BATCH append to an identically-built
    // twin (the deterministic seeded build makes the twin's codebooks
    // bit-identical): both routes share encodeUnderStoredGeometry —
    // the batch side is q133's driver-gated path — so equal probes pin
    // that the epoch sink preserves the CODE geometry end-to-end, the
    // last unpinned (layout × route) cell
    val idxP = scratch("ivfstr-pq")
    Ann.writeIvfIndexPq(part1, "vec_id", "embedding", idxP, nlist = 8,
      m = 4, ksub = 8)
    runStream(idxP, scratch("ivfstr-ckp") + "/ck")
    val idxPb = scratch("ivfstr-pqb")
    Ann.writeIvfIndexPq(part1, "vec_id", "embedding", idxPb, nlist = 8,
      m = 4, ksub = 8)
    Ann.appendIvfIndex(part2, "vec_id", "embedding", idxPb)
    val probeP = Ann.ivfIndexTopKPq(spark, idxP, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    val probePb = Ann.ivfIndexTopKPq(spark, idxPb, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(probeP.exceptAll(probePb).count() == 0 &&
      probePb.exceptAll(probeP).count() == 0,
      "streamed PQ rows diverged from the batch append under the same " +
        "stored codebooks")
    // ...and compaction folds the QUANTIZED epochs (code rows, not
    // float vectors — the fold is schema-generic but only the float
    // path was pinned): stream/ gone, probe answer preserved
    Ann.compactIvfIndex(spark, idxP)
    Ann.compactIvfIndex(spark, idxP) // collect the graced epoch dirs
    assert(!new org.apache.hadoop.fs.Path(s"$idxP/stream")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$idxP/stream")),
      "compaction left the PQ stream/ table behind")
    val probePc = Ann.ivfIndexTopKPq(spark, idxP, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    assert(probePc.exceptAll(probePb).count() == 0 &&
      probePb.exceptAll(probePc).count() == 0,
      "compacting the PQ epochs changed the probe answer")
    // RESIDUAL PQ: the deepest streamed encode (assign under stored
    // coarse centroids AND encode residuals under stored residual
    // codebooks — encodeUnderStoredGeometry's pqRes branch, whose
    // batch twin is q134's driver-gated path). Same twin construction.
    val idxR = scratch("ivfstr-pqr")
    Ann.writeIvfIndexPq(part1, "vec_id", "embedding", idxR, nlist = 4,
      m = 4, ksub = 8, residual = true)
    runStream(idxR, scratch("ivfstr-ckr") + "/ck")
    val idxRb = scratch("ivfstr-pqrb")
    Ann.writeIvfIndexPq(part1, "vec_id", "embedding", idxRb, nlist = 4,
      m = 4, ksub = 8, residual = true)
    Ann.appendIvfIndex(part2, "vec_id", "embedding", idxRb)
    val probeR = Ann.ivfIndexTopKPq(spark, idxR, q,
      "vec_id", "embedding", k = 5, nprobe = 4)
    val probeRb = Ann.ivfIndexTopKPq(spark, idxRb, q,
      "vec_id", "embedding", k = 5, nprobe = 4)
    assert(probeR.exceptAll(probeRb).count() == 0 &&
      probeRb.exceptAll(probeR).count() == 0,
      "streamed residual-PQ rows diverged from the batch append under " +
        "the same stored coarse + residual geometry")
    // a REBUILD re-trains the geometry, so it must clear the streamed
    // epochs (rows encoded under the OLD grid silently mixing into
    // probes of the new index is the torn state the manifest
    // discipline exists to prevent)
    val geomBefore = Ann.readManifest(spark, idxQ).get.geomId
    Ann.writeIvfIndex(e, "vec_id", "embedding", idxQ, nlist = 8,
      quantize = true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idxQ/stream")),
      "rebuild left old-geometry streamed epochs behind")
    val mfReb = Ann.readManifest(spark, idxQ).get
    assert(mfReb.streamMarks.isEmpty && mfReb.geomId != geomBefore,
      s"rebuild must reset stream marks and mint a new geometry id: " +
        s"$mfReb (was geomId=$geomBefore)")
    // a missing index refuses at STREAM START, not first batch
    val bare = scratch("ivfstr-bare")
    val err = intercept[RuntimeException](EventStream.appendIvfIndexStream(
      spark.readStream.schema(part2.schema).parquet(inDir),
      bare, "vec_id", "embedding", checkpoint = bare + "/ck"))
    assert(err.getMessage.contains("manifest"), err.getMessage)
  }

  test("clustered-embedding recall@10: SQ8 preserves the float ranking, residual PQ beats raw PQ, floors pinned") {
    // QuantBench.clusteredVecs — the SAME fixture the SCALE.md
    // nprobe→recall curves are measured on (shared, not re-spelled,
    // so the pinned floors and the bench tables cannot silently drift
    // onto different fixtures — r12 review): 2000 dim-64 UNIT-NORM
    // vectors in 16 clusters — uniform [-1, 1] centers with ±0.2
    // per-coordinate noise (r12 ADVICE: not saturated ±1 corners) —
    // the float top-10 of a query is its own cluster's members, so
    // recall measures whether a quantized metric keeps finding THEM. Unit
    // norm matters: the quantized paths rank by integer L2 while the
    // float path ranks by cosine, and on the unit sphere the two
    // orders coincide — recall isolates pure QUANTIZATION loss
    // (un-normalized vectors add a metric gap that caps recall near
    // 0.7 for every layout at once; measured while building the
    // fixture). Deterministic closed-form fixture → regression pins,
    // not statistical expectations.
    val n = 2000L
    val cv = QuantBench.clusteredVecs(spark, n, clusters = 16)
    val qs = cv.filter(col("vec_id") % 100 === 0) // 20 queries
    val truth = Ann.bruteForceTopK(qs, cv, "vec_id", "embedding",
      "vec_id", "embedding", k = 10).select("query_id", "neighbor_id").cache()
    val nT = truth.count().toDouble
    def recall(h: org.apache.spark.sql.DataFrame): Double = h
      .select("query_id", "neighbor_id")
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .count() / nT
    val sq8 = scratch("clrec-sq8")
    Ann.writeIvfIndex(cv, "vec_id", "embedding", sq8, nlist = 16,
      quantize = true)
    val pq = scratch("clrec-pq")
    Ann.writeIvfIndexPq(cv, "vec_id", "embedding", pq, nlist = 16,
      m = 4, ksub = 64)
    val pqr = scratch("clrec-pqr")
    Ann.writeIvfIndexPq(cv, "vec_id", "embedding", pqr, nlist = 16,
      m = 4, ksub = 64, residual = true)
    def probeS(np: Int) = recall(Ann.ivfIndexTopKQuantized(spark, sq8, qs,
      "vec_id", "embedding", k = 10, nprobe = np))
    def probeP(np: Int) = recall(Ann.ivfIndexTopKPq(spark, pq, qs,
      "vec_id", "embedding", k = 10, nprobe = np))
    def probeR(np: Int) = recall(Ann.ivfIndexTopKPq(spark, pqr, qs,
      "vec_id", "embedding", k = 10, nprobe = np))
    val (s1, s8) = (probeS(1), probeS(16))
    val (p8, r8) = (probeP(16), probeR(16))
    info(f"clustered recall@10: sq8 np1=$s1%.3f np16=$s8%.3f " +
      f"pq np16=$p8%.3f pqr np16=$r8%.3f")
    // SQ8's 255-level grid resolves the within-cluster noise: measured
    // 0.85 exhaustive on this deterministic fixture (the residue is
    // near-tie shuffling among ~125 cluster mates, not lost clusters)
    assert(s8 >= 0.80, f"SQ8 exhaustive recall $s8%.3f < 0.80")
    // a cluster's members land in ONE cell (noise ≪ centroid margins),
    // so even nprobe=1 keeps 0.80 of the exhaustive 0.85 — partition
    // pruning costs recall only when the metric does, which is the
    // IVF family's point
    assert(s1 >= 0.75, f"SQ8 nprobe=1 recall $s1%.3f < 0.75")
    // raw-space PQ codewords park on cluster centers and COLLAPSE
    // cluster mates to near-identical codes (ties → id order — recall
    // tends to k/|cluster|; measured 0.21 at ksub=64); residual
    // codebooks spend the same codeword budget on the WITHIN-cluster
    // noise structure instead (measured 0.33 — ×1.57). The relative
    // pin is the residual train step's justification (Jégou §IV);
    // margins sit under the deterministic measurements.
    assert(r8 >= p8 + 0.08 && r8 >= 0.25,
      f"residual PQ ($r8%.3f) did not beat raw PQ ($p8%.3f) by the " +
        "pinned margin on clustered embeddings")
  }

  test("over-partitioned recall floor: nlist ≫ clusters saturates at " +
      "nprobe ≈ nlist/clusters (the realistic 100-TB sizing rule, " +
      "spec-pinned)") {
    // The regime readers size nprobe from (r12 verdict #4: it lived
    // only in QuantBench output + a SCALE.md table, where a regression
    // would trip nothing): at 100 TB nlist is thousands and natural
    // clusters are fewer, so k-means SPLITS each cluster across
    // ~nlist/clusters cells and a query's true neighbors straddle
    // them — recall climbs with nprobe and saturates once nprobe
    // covers a cluster's shards. Fixture: the SAME clusteredVecs
    // geometry as the aligned test, clusters=16 / nlist=64 →
    // saturation expected at nprobe ≈ 4 (measured np1=0.465,
    // np4=np16=0.850 — the QuantBench overpart curve reproduced at
    // spec scale). The verdict's suggested clusters=4 geometry was
    // MEASURED and rejected: 500-mate clusters make the float top-10
    // a near-tie lottery the 255-level grid cannot resolve
    // (exhaustive SQ8 caps at ~0.5 there — a metric-resolution
    // story masking the pruning story this test pins).
    val n = 2000L
    val cv = QuantBench.clusteredVecs(spark, n, clusters = 16)
    val qs = cv.filter(col("vec_id") % 100 === 0)
    val truth = Ann.bruteForceTopK(qs, cv, "vec_id", "embedding",
      "vec_id", "embedding", k = 10).select("query_id", "neighbor_id").cache()
    val nT = truth.count().toDouble
    def recall(h: org.apache.spark.sql.DataFrame): Double = h
      .select("query_id", "neighbor_id")
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .count() / nT
    val sq8 = scratch("clrec-op-sq8")
    Ann.writeIvfIndex(cv, "vec_id", "embedding", sq8, nlist = 64,
      quantize = true)
    def probeS(np: Int) = recall(Ann.ivfIndexTopKQuantized(spark, sq8, qs,
      "vec_id", "embedding", k = 10, nprobe = np))
    val (s1, s4, s16) = (probeS(1), probeS(4), probeS(16))
    info(f"over-partitioned sq8 recall@10: np1=$s1%.3f np4=$s4%.3f " +
      f"np16=$s16%.3f (clusters=16, nlist=64)")
    // the floor at the sizing point: nprobe = nlist/clusters must
    // already recover the cluster's shards
    assert(s4 >= 0.75, f"SQ8 nprobe=4 recall $s4%.3f < 0.75 — the " +
      "nprobe ≈ nlist/clusters sizing rule regressed")
    // the saturation SHAPE: climbing to it, flat after it — nprobe=1
    // sees ~1/4 of a split cluster; 4 → 16 buys almost nothing more
    assert(s1 <= s4 - 0.10, f"nprobe=1 ($s1%.3f) is not meaningfully " +
      f"below the saturation point ($s4%.3f) — the fixture is no " +
      "longer over-partitioned")
    assert(s16 <= s4 + 0.05, f"recall still climbing past the " +
      f"saturation point (np4=$s4%.3f, np16=$s16%.3f) — the " +
      "nprobe ≈ nlist/clusters rule no longer holds on this fixture")
  }

  test("hyperplane-LSH ANN: pinned recall + exact scores on the driver embeddings") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") % 100 === 0)
    // plant one EXACT copy of each query in the corpus (ids 10000+):
    // θ = 0 pairs share every hyperplane sign, so they collide in every
    // table — recall of the copies is DETERMINISTICALLY total, the
    // hyperplanes being a fixed function of (bit, dimension). This is
    // the operator's actual contract: near-duplicates are found; the
    // ~0.3-cosine "nearest" of quasi-random vectors are not near.
    val planted = q.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val corpus = e.unionByName(planted)
    val lsh = Ann.lshTopK(q, corpus, "vec_id", "embedding",
      "vec_id", "embedding", k = 5)
    val top1 = lsh.filter(col("rank") === 1)
      .select("query_id", "neighbor_id", "score").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.select("vec_id").collect().map(_.getLong(0)).foreach { id =>
      assert(top1(id) == (id + 10000, 1.0),
        s"planted exact copy of $id not recalled at rank 1: ${top1.get(id)}")
    }
    // every LSH hit must carry the TRUE cosine (scores are exact even
    // when the candidate set is approximate) and ranks must be dense
    val truth = Ann.bruteForceTopK(q, corpus, "vec_id", "embedding",
      "vec_id", "embedding", k = 1000)
      .select(col("query_id"), col("neighbor_id"), col("score").as("true_score"))
    val bad = lsh.join(truth, Seq("query_id", "neighbor_id"), "left")
      .filter(col("true_score").isNull || col("score") =!= col("true_score"))
    assert(bad.isEmpty, "LSH emitted a score that is not the exact cosine")
    val ranks = lsh.groupBy("query_id")
      .agg(sort_array(collect_list(col("rank"))).as("rs"))
      .select("rs").collect()
    ranks.foreach { r =>
      val rs = r.getSeq[Int](0)
      assert(rs == (1 to rs.length), s"ranks not dense: $rs")
    }
    // a pair meeting in SEVERAL tables must not duplicate into the rank
    // window: (query, neighbor) pairs are unique
    assert(lsh.groupBy("query_id", "neighbor_id").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("match topK honors k, rank order and hit metadata contract") {
    val docs = Seq(
      (1L, Seq("red", "apple", "pie")),
      (2L, Seq("red", "apple", "tart")),
      (3L, Seq("green", "pear", "pie")),
      (4L, Seq("blue", "sky"))).toDF("id", "toks")
    val q = Seq((100L, Seq("red", "apple"))).toDF("id", "toks")
    val out = MatchJoin.topK(q, docs, "toks", "toks", "id", "id", k = 2)
    val hits = out.orderBy("hit_rank").collect()
    assert(hits.length == 2)
    assert(hits.map(_.getAs[Long]("hit_id")).toSeq == Seq(1L, 2L)) // tie → min rid
    assert(hits.head.getAs[Long]("matchid_hit_matches_unfiltered") == 2L)
    assert(hits.head.getAs[Long]("hit_max_score") == hits.head.getAs[Long]("hit_score"))
    // unmatched left row dropped by default, kept with keepUnmatched
    val q2 = Seq((200L, Seq("nothing", "matches"))).toDF("id", "toks")
    assert(MatchJoin.topK(q2, docs, "toks", "toks", "id", "id", k = 2).count() == 0)
    assert(MatchJoin.topK(q2, docs, "toks", "toks", "id", "id", k = 2,
      keepUnmatched = true).count() == 1)
  }

  test("match topK bm25: tf breaks idf ties, length norm penalizes long docs") {
    // docs 1 and 2 contain the same token SET {red, apple} → identical
    // idf-mode scores; doc 2 repeats "apple" (tf=3) → bm25 must rank it
    // first. Doc 3 shares the set but is padded with unique filler →
    // the length norm must rank it below both.
    val docs = Seq(
      (1L, Seq("red", "apple")),
      (2L, Seq("red", "apple", "apple", "apple")),
      (3L, Seq("red", "apple", "filler1", "filler2", "filler3", "filler4",
        "filler5", "filler6"))).toDF("id", "toks")
    val q = Seq((100L, Seq("red", "apple"))).toDF("id", "toks")
    val idfHits = MatchJoin.topK(q, docs, "toks", "toks", "id", "id", k = 3)
      .orderBy("hit_rank").collect()
    // idf mode cannot separate 1 and 2 (same token set) → min-rid tie
    assert(idfHits.take(2).map(_.getAs[Long]("hit_score")).distinct.length == 1)
    assert(idfHits.head.getAs[Long]("hit_id") == 1L)
    val bm = MatchJoin.topK(q, docs, "toks", "toks", "id", "id", k = 3,
        scoring = "bm25")
      .orderBy("hit_rank").collect()
    assert(bm.map(_.getAs[Long]("hit_id")).toSeq == Seq(2L, 1L, 3L),
      bm.map(r => (r.getAs[Long]("hit_id"), r.getAs[Long]("hit_score"))).toSeq.toString)
    // scores strictly ordered — no accidental tie
    val scores = bm.map(_.getAs[Long]("hit_score")).toSeq
    assert(scores == scores.sorted.reverse && scores.distinct.length == 3)
    // fuzzy + bm25 compose: a one-typo query still reaches the docs
    val qt = Seq((200L, Seq("rad", "apple"))).toDF("id", "toks")
    val fz = MatchJoin.topK(qt, docs, "toks", "toks", "id", "id", k = 1,
      fuzzy = true, scoring = "bm25").collect()
    assert(fz.length == 1 && fz.head.getAs[Long]("hit_id") == 2L)
    // unknown scoring mode fails loudly
    intercept[IllegalArgumentException] {
      MatchJoin.topK(q, docs, "toks", "toks", "id", "id", scoring = "tfidf")
    }
  }

  test("topK: duplicate left rows sharing an id do not inflate hit_score") {
    val docs = Seq((1L, Seq("red", "apple"))).toDF("id", "toks")
    val q1 = Seq((100L, Seq("red", "apple"))).toDF("id", "toks")
    val qDup = Seq((100L, Seq("red", "apple")), (100L, Seq("red", "apple")))
      .toDF("id", "toks")
    val single = MatchJoin.topK(q1, docs, "toks", "toks", "id", "id", k = 1)
      .collect().map(_.getAs[Long]("hit_score")).head
    val dup = MatchJoin.topK(qDup, docs, "toks", "toks", "id", "id", k = 1)
      .select("id", "hit_id", "hit_score").distinct()
      .collect().map(_.getAs[Long]("hit_score"))
    assert(dup.forall(_ == single), s"dup=$dup single=$single")
  }

  test("topKBucketed returns one row per left with an ordered hits array") {
    val docs = Seq(
      (1L, Seq("red", "apple", "pie")),
      (2L, Seq("red", "apple", "tart")),
      (3L, Seq("green", "pear"))).toDF("id", "toks")
    val q = Seq((100L, Seq("red", "apple")), (200L, Seq("nothing"))).toDF("id", "toks")
    val out = MatchJoin.topKBucketed(q, docs, "toks", "toks", "id", "id", k = 5)
    assert(out.count() == 2) // keepUnmatched default: unmatched left kept
    val rows = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    val hits = rows(100L).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hits")
    assert(hits.map(_.getAs[Long]("hit_id")).toSeq == Seq(1L, 2L)) // rank order
    assert(rows(200L).isNullAt(rows(200L).fieldIndex("hits")))
    // inner mode drops the unmatched row
    assert(MatchJoin.topKBucketed(q, docs, "toks", "toks", "id", "id", k = 5,
      keepUnmatched = false).count() == 1)
  }

  test("match topK fuzzy recall: edit-distance-1 tokens match") {
    val docs = Seq((1L, Seq("marseille", "port"))).toDF("id", "toks")
    val q = Seq((9L, Seq("marseile"))).toDF("id", "toks")
    assert(MatchJoin.topK(q, docs, "toks", "toks", "id", "id", k = 1).count() == 0)
    val fuzzy = MatchJoin.topK(q, docs, "toks", "toks", "id", "id", k = 1, fuzzy = true)
    assert(fuzzy.count() == 1)
  }

  test("language id picks the stopword-dominant language") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "le chat est dans la maison et il est un",
      "der Hund ist ein guter Freund und die Katze").toDF("t")
    assert(col1[String](df.select(TextAnalysis.langId(col("t")).as("l")), "l") ==
      Seq("en", "fr", "de"))
  }

  test("text stats: token count, ratios") {
    val df = Seq("Hello, World! Nice day.").toDF("t")
    val out = df.select(
      TextAnalysis.tokenCount(col("t")).as("n"),
      round(TextAnalysis.punctRatio(col("t")), 3).as("p"),
      round(TextAnalysis.meanWordLen(col("t")), 3).as("m"))
    val r = out.collect().head
    assert(r.getInt(0) == 4)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 0.3)
  }

  test("dedupLines drops boilerplate lines and reassembles docs in order") {
    val banner = "accept our cookies"
    val docs = Seq(
      (1L, s"$banner\nunique first line\nsecond thought"),
      (2L, s"$banner\nanother body entirely"),
      (3L, s"$banner\nthird text here"),
      (4L, banner)) // all-boilerplate doc survives with empty text
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique first line\nsecond thought") // order kept
    assert(out(2L) == "another body entirely")
    assert(out(4L) == "")
    assert(out.size == 4)
    // below the frequency cap nothing is touched
    val loose = TextAnalysis.dedupLines(docs, "doc_id", "text", maxDocFreq = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(1L).startsWith(banner))
  }

  test("noveltyScores: shared-gram fractions, short docs, exact-4dp ratio") {
    // 2-grams: doc 1 {a b, b c}; doc 2 {a b, b d}; doc 3 {x y};
    // doc 4 one token (no grams); doc 5 null. Shared (>= 2 docs): "a b".
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "x y"),
      (4L, "solo"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
    assert(out(1L) == ((2, 1, 0.5)))
    assert(out(2L) == ((2, 1, 0.5)))
    assert(out(3L) == ((1, 0, 1.0)))
    assert(out(4L) == ((0, 0, null))) // unscorable, not perfectly novel
    assert(out(5L) == ((0, 0, null)))
    // half-away rounding at the 4th decimal: 1/3 shared -> 0.6667
    val third = Seq((1L, "p q r s"), (2L, "p q zz ww")).toDF("doc_id", "text")
    val t1 = TextAnalysis.noveltyScores(third, "doc_id", "text", n = 2)
      .filter(col("doc_id") === 1).head
    assert(t1.getInt(1) == 3 && t1.getInt(2) == 1 && t1.getDouble(3) == 0.6667)
  }

  test("exactSubstrDedup cuts every duplicated token span, keeps survivors in order") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // head span shared with doc 2
      (2L, "alpha beta gamma other words here"),
      (3L, "unique content entirely"),             // untouched
      (4L, "alpha beta gamma"),                    // fully duplicated -> hollow
      (5L, "rep one two rep one two"),             // intra-doc repeat counts
      (6L, "tiny one"),                            // shorter than n -> no grams
      (7L, null.asInstanceOf[String]))             // null text survives empty
      .toDF("doc_id", "text")
    val out = TextAnalysis.exactSubstrDedup(docs, "doc_id", "text", n = 3)
    assert(out.columns.toSeq == Seq("doc_id", "text", "n_kept", "n_removed"))
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(m.size == 7) // every input doc survives, hollow or not
    assert(m(1L) == (("delta epsilon zeta", 3, 3)))
    assert(m(2L) == (("other words here", 3, 3)))
    assert(m(3L) == (("unique content entirely", 3, 0)))
    assert(m(4L) == (("", 0, 3)))
    // "rep one two" occurs twice inside doc 5 alone -> both spans cut
    assert(m(5L) == (("", 0, 6)))
    assert(m(6L) == (("tiny one", 2, 0)))
    assert(m(7L) == (("", 0, 0)))
    // a span of length m > n duplicated across docs is cut END TO END:
    // every length-n window of it is globally duplicated
    val long = Seq(
      (1L, "one two three four five six seven intro"),
      (2L, "outro one two three four five six seven"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.exactSubstrDedup(long, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(lm == Map(1L -> "intro", 2L -> "outro"))
    // n < 2 is a loud failure, not silent char-level nonsense
    intercept[IllegalArgumentException] {
      TextAnalysis.exactSubstrDedup(docs, "doc_id", "text", n = 1)
    }
  }

  test("contaminationFlags replaces a pre-existing contaminated column; test side may use its own text column") {
    // train already carries a (stale) `contaminated` column — the flag
    // must not become ambiguous and the stale values must be REPLACED
    val train = Seq(
      (1L, "alpha beta gamma delta", false), // stale false, actually dirty
      (2L, "one two three four", true))      // stale true, actually clean
      .toDF("doc_id", "text", "contaminated")
    // benchmark set has neither the train id nor the train text column
    val bench = Seq(("b1", "alpha beta gamma epsilon zeta"))
      .toDF("bench_name", "bench_text")
    val out = TextAnalysis.contaminationFlags(train, bench, "doc_id", "text",
      n = 2, testTextCol = Some("bench_text"))
    assert(out.columns.count(_ == "contaminated") == 1)
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    assert(m == Map(1L -> true, 2L -> false)) // shares "alpha beta"/"beta gamma"
    // drop-variant honours the same test-side column override
    val kept = TextAnalysis.decontaminate(train, bench, "doc_id", "text",
      n = 2, testTextCol = Some("bench_text"))
    assert(col1[Long](kept, "doc_id") == Seq(2L))
  }

  test("contaminationReport: per-test-doc distinct doc/gram counts, zeros for clean items, bloom-invariant") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),  // shares 2 grams with b1
      (2L, "alpha beta other words"),  // shares 1 gram with b1
      (3L, "one two three four"))      // clean
      .toDF("doc_id", "text")
    val bench = Seq(
      ("b1", 10L, "alpha beta gamma epsilon"), // leaked: alpha-beta, beta-gamma
      ("b2", 20L, "nothing shared here at all"))
      .toDF("bench_name", "bench_id", "bench_text")
    def report(fpp: Option[Double]) = TextAnalysis.contaminationReport(
        train, bench, "doc_id", "text", n = 2,
        testIdCol = Some("bench_id"), testTextCol = Some("bench_text"),
        bloomFpp = fpp)
      .collect().map(r => r.getAs[Long]("test_id") ->
        ((r.getAs[Long]("n_contaminating_docs"), r.getAs[Long]("n_shared_grams"),
          r.getAs[Boolean]("contaminated")))).toMap
    val plain = report(None)
    // b1: docs {1,2} leak; distinct leaked grams of b1 = {alpha beta,
    // beta gamma} = 2. b2 clean → explicit zeros, present in the report.
    assert(plain == Map(10L -> ((2L, 2L, true)), 20L -> ((0L, 0L, false))),
      plain.toString)
    // the Bloom prefilter changes the plan, never the report
    assert(report(Some(0.01)) == plain)
  }

  test("clusterAssign: nearest centroid, deterministic ties, NULL/bad vectors") {
    import graft.sim.Cluster
    val docs = Seq(
      (1L, Some(Seq(0.0f, 0.1f))),   // nearest c10 at (0,0)
      (2L, Some(Seq(5.0f, 5.1f))),   // nearest c20 at (5,5)
      (3L, Some(Seq(2.5f, 2.5f))),   // EQUIDISTANT c10/c20 → min cid 10
      (4L, None),                    // NULL vector → NULL cluster
      (5L, Some(Seq(9.0f))))         // wrong dim → no centroid can win → NULL
      .toDF("id", "v")
    val cents = Seq((20L, Seq(5.0, 5.0)), (10L, Seq(0.0, 0.0)))
      .toDF("cid", "cv")
    val out = Cluster.clusterAssign(docs, "id", "v", cents, "cid", "cv")
      .orderBy("id").collect()
    def cl(i: Int): Option[Long] =
      if (out(i).isNullAt(out(i).fieldIndex("cluster_id"))) None
      else Some(out(i).getAs[Long]("cluster_id"))
    assert(cl(0) == Some(10L) && cl(1) == Some(20L))
    assert(cl(2) == Some(10L), "equidistant tie must break to the smaller cid")
    assert(cl(3) == None && cl(4) == None)
    // the assignment is a broadcast fold — the corpus side must not
    // shuffle (BroadcastNestedLoopJoin of the 1-row codebook, no
    // hashpartitioning exchange on the docs)
    val plan = Cluster.clusterAssign(docs, "id", "v", cents, "cid", "cv")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(id"), plan)

    // balanced sampling caps each cluster's contribution; NULL-cluster
    // rows survive
    val many = (0 until 40).map(i =>
        (i.toLong, Some(Seq((i % 2) * 5.0f, (i % 2) * 5.0f)))).toDF("id", "v")
      .unionByName(Seq((99L, Option.empty[Seq[Float]])).toDF("id", "v"))
    val capped = Cluster.balancedSample(many, "id", "v", cents, "cid", "cv",
      nPerCluster = 3)
    assert(capped.filter(col("cluster_id").isNotNull).count() == 6) // 3 × 2 clusters
    assert(capped.filter(col("cluster_id").isNull).count() == 1)    // id 99 kept

    // a negative centroid id is a legitimate id, not a sentinel — the
    // "nothing won" state is a NULL cid, so cid −1 must assign normally
    val negCents = Seq((-1L, Seq(0.0, 0.0)), (7L, Seq(9.0, 9.0))).toDF("cid", "cv")
    val neg = Cluster.clusterAssign(
      Seq((1L, Seq(0.1f, 0.0f))).toDF("id", "v"), "id", "v", negCents, "cid", "cv")
      .head
    assert(neg.getAs[Long]("cluster_id") == -1L)

    // fitCentroids: deterministic in (data, k, seed); k cluster rows
    val fit1 = Cluster.fitCentroids(many.filter(col("v").isNotNull), "id", "v", k = 2)
    val fit2 = Cluster.fitCentroids(many.filter(col("v").isNotNull), "id", "v", k = 2)
    assert(fit1.collect().map(_.toString).sorted.toSeq ==
      fit2.collect().map(_.toString).sorted.toSeq)
    assert(fit1.count() == 2)
    // the two obvious centers: (0,0)-ish and (5,5)-ish
    val cs = fit1.collect().map(_.getAs[Seq[Double]]("cv").head).sorted
    assert(cs(0) < 1.0 && cs(1) > 4.0, cs.mkString(","))

    // the update is FLOOR division, not truncation: 2^-8 and -2^-8
    // quantize to +39 / -40 (floor), sum -1 over 2 members → centroid
    // -1, where truncating division would give 0. This is the exact
    // arithmetic the DuckDB oracle replays via the pmod trick — a
    // truncate on either side forks the engines on negative sums.
    val neg2 = Seq((1L, Seq(0.00390625f)), (2L, Seq(-0.00390625f)))
      .toDF("id", "v")
    val fneg = Cluster.fitCentroids(neg2, "id", "v", k = 1, iters = 1)
      .collect()
    assert(fneg.length == 1)
    assert(math.round(fneg(0).getAs[Seq[Double]]("cv").head * 10000) == -1L,
      fneg(0).toString)

    // an empty cluster keeps its centroid instead of vanishing: two
    // identical points seed two identical centroids; ties send every
    // member to the smaller cid, yet k stays 2
    val same = Seq((1L, Seq(1.0f)), (2L, Seq(1.0f))).toDF("id", "v")
    val fsame = Cluster.fitCentroids(same, "id", "v", k = 2, iters = 2)
    assert(fsame.count() == 2)
    assert(fsame.collect().map(_.getAs[Seq[Double]]("cv").head).toSet
      == Set(1.0), "both centroids must survive at the seed coordinate")

    // the driver-side and distributed fit regimes must be bit-identical
    // (same init ranking, argmin, floor-division update) — including a
    // wrong-dimension row that must sit out of assignment in both
    val sample = ((0 until 60).map(i =>
        (i.toLong, Seq((i % 5).toFloat, (i % 7).toFloat))) :+
        (60L, Seq(9.0f)))
      .toDF("id", "v")
    val loc = Cluster.fitCentroidsQ(sample, "id", "v", 4, 42L, 4, 10000)
    val dist = Cluster.fitCentroidsQ(sample, "id", "v", 4, 42L, 4, 10000,
      localThreshold = 0)
    assert(loc == dist, s"local $loc vs distributed $dist")

    // a NULL id hashes to NULL and would seed init NONDETERMINISTICALLY
    // — such rows are excluded from the fit in both regimes (they can
    // still be assigned later; clusterAssign never reads the id)
    val nullRow = Seq(Tuple1(Seq(9.9f, 9.9f))).toDF("v")
      .withColumn("id", org.apache.spark.sql.functions.lit(null).cast("long"))
      .select("id", "v")
    val withNull = sample.unionByName(nullRow)
    assert(Cluster.fitCentroidsQ(withNull, "id", "v", 4, 42L, 4, 10000) == loc)
    assert(Cluster.fitCentroidsQ(withNull, "id", "v", 4, 42L, 4, 10000,
      localThreshold = 0) == loc)
  }

  test("bloom-prefiltered decontamination is exactly the semi-join answer") {
    // 200 train docs, every 10th contaminated by a 3-gram from the
    // benchmark; the Bloom path must flag EXACTLY the same docs (the
    // exact verify join removes the filter's false positives), and the
    // map-side prefilter must appear in the physical plan BEFORE any
    // exchange — that ordering is the whole 100-TB point
    val train = (1L to 200L).map { i =>
      val tail = if (i % 10 == 0) "held out secret phrase" else s"clean text $i"
      (i, s"document number $i says $tail")
    }.toDF("doc_id", "text")
    val bench = Seq("the held out secret phrase appears here")
      .toDF("text")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.filter(col("contaminated")).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
    val plain = TextAnalysis.contaminationFlags(train, bench, "doc_id", "text", n = 3)
    val bloom = TextAnalysis.contaminationFlags(train, bench, "doc_id", "text",
      n = 3, bloomFpp = Some(0.01))
    assert(ids(bloom) == ids(plain))
    assert(ids(bloom) == (10L to 200L by 10L))
    // plan shape: the bloom membership filter sits under the first
    // exchange on the train-gram side (BatchEvalPython-free, a plain
    // scala UDF filter) — presence + placement, not exact tree
    val phys = bloom.queryExecution.executedPlan.toString
    assert(phys.contains("UDF"), "bloom prefilter UDF missing from plan")
    // the drop-variant and an empty benchmark behave like the plain path
    val kept = TextAnalysis.decontaminate(train, bench, "doc_id", "text",
      n = 3, bloomFpp = Some(0.01))
    assert(kept.count() == 180)
    val none = TextAnalysis.decontaminate(train,
      bench.limit(0), "doc_id", "text", n = 3, bloomFpp = Some(0.01))
    assert(none.count() == 200)
    // a nonsensical fpp fails loudly at build
    intercept[IllegalArgumentException] {
      TextAnalysis.decontaminate(train, bench, "doc_id", "text",
        n = 3, bloomFpp = Some(1.5)).count()
    }
  }

  test("winnowing fingerprints: identity, shared-substring guarantee, edges") {
    val common = "entity resolution at one hundred terabytes of text"
    val docs = Seq(
      (1L, s"prefix about nothing $common"),
      (2L, s"$common with an entirely different ending clause"),
      (3L, "completely unrelated content on another topic altogether"),
      (4L, "tiny"), // shorter than k after normalize → no fingerprints
      (5L, s"prefix about nothing $common")) // exact dup of 1
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnow(docs, "doc_id", "text")
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // identical docs → identical fingerprint sets
    assert(byDoc(1L) == byDoc(5L) && byDoc(1L).nonEmpty)
    // winnowing guarantee: a shared substring of length >= k+w-1 leaves
    // at least one common fingerprint (docs 1 and 2 share `common`)
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // unrelated docs share (essentially) nothing
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // sub-k text yields no rows; so does null
    assert(!byDoc.contains(4L))
    val withNull = Seq((9L, null: String)).toDF("doc_id", "text")
    assert(TextAnalysis.winnow(withNull, "doc_id", "text").count() == 0)
    // fingerprints are a large compression of the gram count
    val textLen = common.length
    assert(byDoc(1L).size < textLen)

    // overlap pairs: exact dup scores 1.0; the substring-sharing pair
    // clears a low threshold; unrelated docs never pair
    val pairs = TextAnalysis.winnowNearDups(docs, "doc_id", "text", threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("overlap")).toMap
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.3)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // the hot-fingerprint cap drops boilerplate shared by every doc
    val capped = TextAnalysis.winnowNearDups(docs, "doc_id", "text",
      threshold = 0.1, maxDocFreq = 2)
    assert(capped.count() <= TextAnalysis.winnowNearDups(docs, "doc_id", "text",
      threshold = 0.1).count())
  }

  test("incrementalDedup: batch-vs-corpus anti, within-batch keep-min, bloom ≡ none") {
    val corpus = Seq(
      (100L, "already ingested alpha"),
      (101L, "already ingested beta"),
      (102L, null: String)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "already ingested alpha"),  // in corpus → dropped
      (2L, "fresh gamma"),             // novel → kept
      (3L, "fresh delta"),             // novel → kept
      (4L, "fresh gamma"),             // within-batch dup of 2 → dropped
      (5L, null: String),              // NULL text → kept (not a dup of 102)
      (6L, null: String))              // NULL text → also kept
      .toDF("doc_id", "text")
    val plain = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
    assert(plain.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 5L, 6L))
    // the bloom prefilter must be invisible in the output (no false
    // negatives; the exact key join discards its false positives)
    val bloomed = Dedup.incrementalDedup(batch, corpus, "doc_id", "text",
      bloomFpp = Some(0.01))
    assert(bloomed.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 5L, 6L))
    // fingerprint key: word-order/case variants count as already-seen
    val fpBatch = Seq((1L, "Ingested ALREADY alpha"), (2L, "novel thing")).toDF("doc_id", "text")
    val fp = Dedup.incrementalDedup(fpBatch, corpus, "doc_id", "text",
      method = "fingerprint")
    assert(fp.collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[RuntimeException](
      Dedup.incrementalDedup(batch, corpus, "doc_id", "text", method = "nope"))
    // an all-NULL batch with bloom on: nothing to build a filter from,
    // nothing can match — every row survives
    val nullBatch = Seq((7L, null: String)).toDF("doc_id", "text")
    assert(Dedup.incrementalDedup(nullBatch, corpus, "doc_id", "text",
      bloomFpp = Some(0.01)).count() == 1)
  }

  test("incrementalNearDups: verified corpus near-dups, NULL/blank kept, bloom ≡ plain") {
    val tpl = "shared boilerplate press release text appears many times verbatim"
    val corpus = Seq(
      (100L, tpl),                                                      // clone of batch 1
      (101L, tpl),                                                      // second clone → n_corpus_dups 2
      (102L, "completely different corpus material entirely unrelated"),
      (103L, null: String)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, tpl),                                                        // near-dup'd twice in corpus
      (2L, "totally novel batch document about something else entirely"),
      (3L, null: String),                                               // no shingles → kept, NULL max
      (4L, "")).toDF("doc_id", "text")                                  // blank → kept
    val v = Dedup.incrementalNearDups(batch, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))).toMap
    assert(v(1L) == ((2L, Some(1.0), false)))
    assert(v(2L) == ((0L, None, true)))
    assert(v(3L) == ((0L, None, true)))
    assert(v(4L) == ((0L, None, true)))
    // the bloom band-bucket prefilter must be invisible in the output
    // (no false negatives; the exact band join + Jaccard verify decide)
    val vb = Dedup.incrementalNearDups(batch, corpus, "doc_id", "text",
      bloomFpp = Some(0.01))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    assert(vb == v.map { case (id, (n, _, k)) => (id, n, k) }.toSet)
    // drop variant: corpus near-dups vanish, then WITHIN-batch minhash
    // dedup keeps min id per clone cluster; NULL/blank rows survive
    val batch2 = batch.union(Seq(
      (5L, "totally novel batch document about something else entirely"))
      .toDF("doc_id", "text"))
    val kept = Dedup.incrementalNearDedup(batch2, corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L))
    intercept[IllegalArgumentException](
      Dedup.incrementalNearDups(batch, corpus, "doc_id", "text",
        numHashes = 64, bands = 7))

    // the persisted band index must reproduce the direct verdicts
    // exactly — build, manifest, probe (plain AND bloom); a missing
    // manifest (torn build) fails loudly instead of probing nothing
    def verdictSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toSet
    val idxDir = scratch("neardup-idx")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idxDir)
    val direct = verdictSet(
      Dedup.incrementalNearDups(batch, corpus, "doc_id", "text"))
    assert(verdictSet(Dedup.incrementalNearDupsIndexed(
      batch, idxDir, "doc_id", "text")) == direct)
    assert(verdictSet(Dedup.incrementalNearDupsIndexed(
      batch, idxDir, "doc_id", "text", bloomFpp = Some(0.01))) == direct)
    val noIdx = intercept[RuntimeException](
      Dedup.incrementalNearDupsIndexed(batch, s"$idxDir/nope",
        "doc_id", "text"))
    assert(noIdx.getMessage.contains("manifest"), noIdx.getMessage)

    // a failing REBUILD must retract the manifest BEFORE touching the
    // tables — a surviving old manifest would certify torn state and
    // probes would silently find nothing instead of failing loudly
    val boom = org.apache.spark.sql.functions.udf { (s: String) =>
      sys.error("boom"): String }
    intercept[Throwable](Dedup.writeNearDupIndex(
      corpus.withColumn("text", boom(col("text"))), "doc_id", "text", idxDir))
    assert(Dedup.readNearDupManifest(spark, idxDir).isEmpty,
      "failed rebuild left a live manifest")
    val torn = intercept[RuntimeException](
      Dedup.incrementalNearDupsIndexed(batch, idxDir, "doc_id", "text"))
    assert(torn.getMessage.contains("manifest"), torn.getMessage)
  }

  test("sourceOverlap: distinct-key containment matrix, NULL source group, fingerprint keys") {
    val df = Seq(
      ("A", "shared alpha"), ("A", "shared alpha"), // within-source dup → ONE key
      ("A", "only in a"),
      ("B", "shared alpha"), ("B", "shared beta"),
      ("C", "shared beta"),
      (null, "shared alpha"),                       // NULL source is a group
      ("C", null: String))                          // NULL text sits out
      .toDF("source", "text")
    val m = Dedup.sourceOverlap(df, "source", "text").collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(m == Set(
      (None, "A", 1L, 1L, 2L, 10000L),      // NULL group ordered first
      (None, "B", 1L, 1L, 2L, 10000L),
      (Some("A"), "B", 1L, 2L, 2L, 5000L),  // containment of the smaller side
      (Some("B"), "C", 1L, 2L, 1L, 10000L)), m.toString)
    // fingerprint keys: case/word-order variants are one shared key
    val fp = Dedup.sourceOverlap(
      Seq(("A", "Alpha Shared"), ("B", "shared ALPHA")).toDF("source", "text"),
      "source", "text", method = "fingerprint").collect()
    assert(fp.length == 1 && fp(0).getLong(2) == 1L && fp(0).getLong(5) == 10000L)
    intercept[RuntimeException](
      Dedup.sourceOverlap(df, "source", "text", method = "nope"))
  }

  test("crossSourceNearDupOverlap: asymmetric matrix, distinct docs, NULL source group, same-source pairs ignored") {
    val docs = Seq(
      (1L, "A", "the quick brown fox jumps over the lazy dog"),
      (2L, "B", "the quick brown fox jumps over the lazy dog"), // exact cross-dup of 1
      (3L, "B", "the quick brown fox jumps over the lazy dog today"), // 0.875 vs 1/2
      (4L, "A", "completely different text about nothing shared anywhere"),
      (5L, "C", "another unrelated document in the third source"),
      (6L, "A", null: String), // no shingles → out of both sides
      (7L, null: String, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "src", "text")
    val m = Dedup.crossSourceNearDupOverlap(docs, "id", "text", "src")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // universes: A = {1, 4} (6 sits out), B = {2, 3}, C = {5}, NULL = {7}
    assert(m == Map(
      // 2 and 3 are BOTH within reach of A's doc 1, but doc 1 counts
      // ONCE in the A→B direction — distinct docs, not pair volume
      (Some("A"), Some("B")) -> (1L, 2L, 5000L),
      (Some("B"), Some("A")) -> (2L, 2L, 10000L),
      (Some("A"), None) -> (1L, 2L, 5000L),
      (None, Some("A")) -> (1L, 1L, 10000L),
      (Some("B"), None) -> (2L, 2L, 10000L),
      (None, Some("B")) -> (1L, 1L, 10000L)), m.toString)
    // C shares nothing → absent entirely; same-source near-dups (none
    // planted here, but 2-3 would be one at B-B) never create a row
    assert(!m.keySet.exists { case (a, b) => a == b || a == Some("C") ||
      b == Some("C") })
  }

  test("crossSourceContainmentOverlap: sees the quotation Jaccard misses; exact copies collapse; NULL source; hot-gram cap consistent") {
    // the discriminating shape: a 9-word quote (7 word-3-shingles)
    // contained WHOLE in a 28-word page of another source — min-side
    // containment 10⁴ bp, Jaccard 7/26 ≈ 0.27
    val quote = "sierra tango uniform victor whiskey xray yankee zulu quebec"
    val page = "framing commentary narrative opens preamble context " +
      quote + " trailing analysis continues onward covering manifold " +
      "subsequent windows entirely separate tokens conclude"
    val docs = Seq(
      (1L, Option("A"), quote),
      (2L, Option("B"), page),  // quotes doc 1 whole
      (3L, Option("A"), quote), // exact copy of 1 → same rep, cnt 2
      (4L, Option("B"), "entirely unrelated page about other things " +
        "with many words here"),
      (5L, Option.empty[String], quote), // NULL source is its own group
      (6L, Option("A"), null: String))   // no shingles → out of both sides
      .toDF("id", "src", "text")
    val m = Dedup.crossSourceContainmentOverlap(docs, "id", "text", "src",
        thresholdBp = 8000L)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // universes: A = {1, 3} (6 sits out), B = {2, 4}, NULL = {5}
    assert(m == Map(
      (Some("A"), Some("B")) -> (2L, 2L, 10000L), // both copies quoted in 2
      (Some("B"), Some("A")) -> (1L, 2L, 5000L),
      (Some("A"), None) -> (2L, 2L, 10000L),      // exact cross-copies
      (None, Some("A")) -> (1L, 1L, 10000L),
      (Some("B"), None) -> (1L, 2L, 5000L),
      (None, Some("B")) -> (1L, 1L, 10000L)), m.toString)
    // the DISCRIMINATOR: the near-dup matrix at 0.6 must NOT connect A
    // and B — the quote-in-page pair is invisible to Jaccard (the exact
    // A↔NULL copies are visible to both families, as they should be)
    val nd = Dedup.crossSourceNearDupOverlap(docs, "id", "text", "src",
        threshold = 0.6)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
      .toSet
    assert(!nd.contains((Some("A"), Some("B"))) &&
      !nd.contains((Some("B"), Some("A"))),
      s"Jaccard at 0.6 saw the quotation pair: $nd")
    assert(nd.contains((Some("A"), None)), s"near-dup missed the exact copies: $nd")
    // hot-gram cap: the quote's shingles live in 3 collapsed groups —
    // maxDocFreq = 1 removes them from the UNIVERSE, the quote groups
    // go gramless and sit out, and no pair survives (the filtered
    // metric is exact, not a lossy candidate cut); a cap of 3 removes
    // nothing and reproduces the full matrix
    assert(Dedup.crossSourceContainmentOverlap(docs, "id", "text", "src",
      thresholdBp = 8000L, maxDocFreq = Some(1)).isEmpty)
    val capped = Dedup.crossSourceContainmentOverlap(docs, "id", "text",
        "src", thresholdBp = 8000L, maxDocFreq = Some(3))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(capped == m, capped.toString)
    intercept[IllegalArgumentException](Dedup.crossSourceContainmentOverlap(
      docs, "id", "text", "src", thresholdBp = 10001L))
    intercept[IllegalArgumentException](Dedup.crossSourceContainmentOverlap(
      docs, "id", "text", "src", maxDocFreq = Some(0)))
  }

  test("semanticContaminationFlags: max cosine vs test set, NULLs, empty test set") {
    val corpus = Seq(
      (1L, Some(Seq(1.0f, 0.0f))),   // = test vector → max_cos 1.0
      (2L, Some(Seq(0.0f, 1.0f))),   // orthogonal → max_cos 0.0
      (3L, Some(Seq(0.97f, 0.2f))),  // cos ≈ 0.979 with (1,0)
      (4L, None),                    // NULL vec → NULL max, not contaminated
      (5L, Some(Seq(1.0f))))         // wrong dim → NULL cosine everywhere
      .toDF("id", "v")
    val test = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("tv")
    val out = Ann.semanticContaminationFlags(corpus, "id", "v", test, "tv", 0.9)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getBoolean(3))).toMap
    assert(out(1L) == (Some(1.0), true))
    assert(out(2L) == (Some(0.0), false))
    assert(out(3L)._1.get > 0.9 && out(3L)._2)
    assert(out(4L) == (None, false))
    assert(out(5L) == (None, false))
    // empty test set: nothing to compare against → all clean, none dropped
    val empty = test.filter(lit(false))
    val flags = Ann.semanticContaminationFlags(corpus, "id", "v", empty, "tv", 0.9)
    assert(flags.filter(col("contaminated")).count() == 0)
    assert(flags.count() == 5)
    assert(Ann.semanticDecontaminate(corpus, "id", "v", test, "tv", 0.9)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 5L))
    intercept[IllegalArgumentException](
      Ann.semanticContaminationFlags(corpus, "id", "v", test, "tv", 1.5))
  }

  test("dedupKeepBest keeps the max-score row per key, min id on ties, NULLs per family contract") {
    val df = Seq(
      (1L, "the quick fox", Some(10L)),   // dup group A, low score
      (2L, "the quick fox", Some(30L)),   // dup group A, BEST → survives
      (3L, "the quick fox", Some(30L)),   // dup group A, tie → id 2 wins
      (4L, "something else", None),       // group B: all-NULL scores →
      (5L, "something else", None),       //   min id 4 survives
      (6L, null, Some(99L)),              // NULL text → kept
      (7L, null, None))                   // NULL text → kept
      .toDF("doc_id", "text", "score")
    val kept = Dedup.dedupKeepBest(df, "doc_id", "text", "score")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L, 6L, 7L), kept.toString)
    // fingerprint key: word-order variants form one group; best wins
    val fp = Seq((1L, "alpha beta", Some(1L)), (2L, "Beta ALPHA", Some(2L)))
      .toDF("doc_id", "text", "score")
    assert(Dedup.dedupKeepBest(fp, "doc_id", "text", "score",
      method = "fingerprint").collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[RuntimeException](
      Dedup.dedupKeepBest(df, "doc_id", "text", "score", method = "nope"))
    // the capPerKey plan shape: WindowGroupLimit prunes before the sort
    assert(Dedup.dedupKeepBest(df, "doc_id", "text", "score")
      .queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("cluster dedup keep-best: the max-score row represents each near-dup cluster") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val df = Seq(
      (1L, base, 10L),
      (2L, base.replace("today", "tonight"), 50L), // near-dup of 1, BEST
      (3L, base.replace("today", "tomorrow"), 20L), // same cluster
      (4L, "completely different text about catalyst plans and shuffles here now", 1L))
      .toDF("doc_id", "text", "score")
    val kept = Dedup.minhashDedup(df, "doc_id", "text", threshold = 0.5,
      keepScore = Some("score"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 4L), kept.toString) // best of the cluster + singleton
    // default stays keep-min (the q26 contract, unchanged)
    assert(Dedup.minhashDedup(df, "doc_id", "text", threshold = 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    // embedding family: identical vectors cluster; max score survives
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 1L), (2L, Seq(1.0f, 0.0f), 9L),
      (3L, Seq(0.0f, 1.0f), 5L))
      .toDF("id", "v", "q")
    assert(Dedup.embeddingDedup(vecs, "id", "v", threshold = 0.9999,
      keepScore = Some("q"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("semanticContaminationFlagsLsh: certain recall on identical vectors, no false flags") {
    // 40 corpus rows on distinct random-ish directions + 3 exact copies
    // of the test vector: identical vectors share every bucket (θ=0) so
    // recall is deterministic, and every flag is exact-cosine verified
    val rnd = new scala.util.Random(7)
    val planted = Seq(5L, 17L, 29L)
    val corpus = (1L to 40L).map { id =>
      val v = if (planted.contains(id)) Seq(1.0f, 0.0f, 0.0f, 0.0f)
        else Array.fill(4)(rnd.nextFloat() * 2 - 1).toSeq
      (id, v)
    }.toDF("id", "v")
    val test = Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("tv")
    val out = Ann.semanticContaminationFlagsLsh(
      corpus, "id", "v", test, "tv", threshold = 0.9999)
    val flagged = out.filter(col("contaminated"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == planted, s"got $flagged")
    // flagged rows carry the exact candidate max (here the identical
    // pair → 1.0); unflagged rows report NULL or a verified sub-threshold
    assert(out.filter(col("contaminated"))
      .collect().forall(_.getAs[Double]("max_cos_q") == 1.0))
    assert(out.count() == 40) // every corpus row present, flag or not
    intercept[IllegalArgumentException](
      Ann.semanticContaminationFlagsLsh(corpus, "id", "v", test, "tv",
        0.9, bits = 40, tables = 3))
  }

  // ------------------------------------------------ duplication weights
  test("duplicationWeights: group mass sums to one doc's worth; NULL text unknown; key choice matters") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "unique body"),
      (5L, "Same   TEXT"),        // fingerprint-equal to 1-3, exact-distinct
      (6L, null.asInstanceOf[String]), (7L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val exact = Dedup.duplicationWeights(docs, "id", "text", "exact")
      .select("id", "dup_count", "weight_bp")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(exact(1L) == (Some(3L), Some(3333L)))   // 10000 div 3
    assert(exact(4L) == (Some(1L), Some(10000L)))
    assert(exact(5L) == (Some(1L), Some(10000L)))  // exact key: distinct
    assert(exact(6L) == (None, None) && exact(7L) == (None, None))
    val fp = Dedup.duplicationWeights(docs, "id", "text", "fingerprint")
      .select("id", "dup_count")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fp(5L) == Some(4L), "normalized key folds casing/whitespace")
    intercept[RuntimeException](
      Dedup.duplicationWeights(docs, "id", "text", "nope"))
  }

  // ------------------------------------------------- int8 quantized ANN
  test("int8Params + quantizeInt8: codebook, clamp edges, degenerate dim, NULLs") {
    val df = Seq(
      (1L, Seq(0.0f, 5.0f, 7.0f)),
      (2L, Seq(10.0f, 5.0f, 3.0f)),
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "v")
    val params = Ann.int8Params(df, "v").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(params == Map(0 -> (0.0, 10.0), 1 -> (5.0, 5.0), 2 -> (3.0, 7.0)))
    val q = Ann.quantizeInt8(df, "v", Ann.int8Params(df, "v"))
      .select("id", "qvec").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Integer](1))).toMap
    // dim0: 0→0, 10→255 (exact top of range); dim1 degenerate → 0;
    // dim2: 7→255, 3→0
    assert(q(1L).get == Seq(0, 0, 255), q(1L).toString)
    assert(q(2L).get == Seq(255, 0, 0), q(2L).toString)
    assert(q(3L).isEmpty, "NULL vector stays NULL")
    // a codebook GAP (pos 1 missing) must NULL exactly that dimension —
    // a positional lookup would misalign pos 2 against pos 1's range
    val gappy = Seq((0, 0.0, 10.0), (2, 3.0, 7.0)).toDF("pos", "mn", "mx")
    val qg = Ann.quantizeInt8(df.filter(col("id") === 1L), "v", gappy)
      .select("qvec").head().getSeq[Integer](0)
    assert(qg(0) == 0 && qg(1) == null && qg(2) == 255, qg.toString)
  }

  test("quantizedTopK: planted duplicate at d2q 0; clusters never cross; NULL grids excluded") {
    val rnd = new scala.util.Random(5)
    def near(base: Float) = Seq.fill(4)(base + rnd.nextFloat() * 0.1f)
    // cluster A around 1.0, cluster B around 100.0; id 1 and 2 identical
    val a1 = Seq(1.0f, 1.1f, 0.9f, 1.0f)
    val rows = Seq((1L, a1), (2L, a1)) ++
      (3L to 10L).map(i => (i, near(1.0f))) ++
      (11L to 20L).map(i => (i, near(100.0f))) :+
      (21L, Seq(1.0f, null.asInstanceOf[Float], 1.0f, 1.0f))
    val df = rows.toDF("vec_id", "v")
      // a NULL element survives toDF as 0.0 for primitives — rebuild it
      .withColumn("v", when(col("vec_id") === 21L,
        array(lit(1.0f), lit(null).cast("float"), lit(1.0f), lit(1.0f)))
        .otherwise(col("v")))
    val qdf = Ann.quantizeInt8(df, "v", Ann.int8Params(df, "v"))
    val top = Ann.quantizedTopK(qdf.filter(col("vec_id") === 1L), qdf,
      "vec_id", "qvec", "vec_id", "qvec", k = 9).collect()
    assert(top.head.getLong(1) == 2L && top.head.getLong(2) == 0L,
      s"identical vector must rank first at d2q 0: ${top.head}")
    // every neighbor of the A-query is an A-member (quantization error
    // cannot bridge a 100x cluster gap); the NULL-grid row never appears
    val ids = top.map(_.getLong(1)).toSet
    assert(ids.subsetOf((2L to 10L).toSet), ids.toString)
    assert(!ids.contains(21L))
  }

  // ---------------------------------------------------- containment pairs
  test("containment finds the subset pair Jaccard structurally misses") {
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val small = "alpha beta gamma delta epsilon" // literal prefix → grams ⊂ big's
    val docs = Seq((1L, big, "b"), (2L, small, "b"), (3L, "totally different words here", "b"))
      .toDF("id", "text", "blk")
    val pairs = Dedup.containmentPairs(docs, "id", "text", "blk",
        n = 3, thresholdBp = 9500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 10000L)), pairs.mkString(";"))
    // the SAME pair under Jaccard at a plain near-dup threshold: absent
    assert(Dedup.ngramJaccardPairs(docs, "id", "text", "blk",
      n = 3, threshold = 0.8).count() == 0)
  }

  test("containment (char unit): threshold excludes partial overlap; blocks isolate; gramless docs sit out") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "b1"),
      (2L, "alpha beta zzz qqq vvv www", "b1"),  // shares only 'alpha beta'
      (3L, "alpha beta gamma delta", "b2"),       // identical to 1, other block
      (4L, null.asInstanceOf[String], "b1"),
      (5L, "ab", "b1"))                           // shorter than n after normalize
      .toDF("id", "text", "blk")
    val out = Dedup.containmentPairs(docs, "id", "text", "blk",
      n = 3, thresholdBp = 9000L, unit = "char")
    assert(out.count() == 0, out.collect().mkString(";"))
    // drop the threshold and the partial pair appears with its exact bp
    val loose = Dedup.containmentPairs(docs, "id", "text", "blk",
        n = 3, thresholdBp = 1000L, unit = "char")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((1L, 2L)))
    assert(!loose.exists(p => p._1 == 3L || p._2 == 3L), "blocks must isolate")
    intercept[RuntimeException](
      Dedup.containmentPairs(docs, "id", "text", "blk", unit = "sentence"))
  }

  test("containment: word vs char units disagree exactly where they should") {
    // same 2-token overlap: at the char level 'alpha beta ' dominates
    // the short doc's grams; at the word level no 3-shingle is shared
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "b"),
      (2L, "alpha beta", "b"))
      .toDF("id", "text", "blk")
    val word = Dedup.containmentPairs(docs, "id", "text", "blk",
      n = 3, thresholdBp = 5000L)
    assert(word.count() == 0,
      "no shared word 3-shingle: the 2-token doc folds to one whole-text shingle")
    val char = Dedup.containmentPairs(docs, "id", "text", "blk",
        n = 3, thresholdBp = 5000L, unit = "char")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(char.toSeq == Seq((1L, 2L, 10000L)),
      s"every char gram of 'alpha beta' is inside the long doc: ${char.mkString(";")}")
  }

  test("containment: maxDocFreq cap keeps exact-dup pairs via non-hot prefix grams") {
    // 'shared boiler line' grams are in EVERY doc (hot); docs 1/2 are
    // exact dups whose remaining grams are unique to them
    val docs = Seq(
      (1L, "unique payload one shared boiler line", "b"),
      (2L, "unique payload one shared boiler line", "b"),
      (3L, "other content entirely shared boiler line", "b"),
      (4L, "fourth body of text shared boiler line", "b"))
      .toDF("id", "text", "blk")
    val capped = Dedup.containmentPairs(docs, "id", "text", "blk",
        n = 3, thresholdBp = 9900L, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == Seq((1L, 2L, 10000L)), capped.mkString(";"))
  }

  test("containment: prefix-filtered plan matches the brute-force metric exactly") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("data", "spark", "table", "row", "scan", "merge", "key", "hash")
    val docs = (1L to 40L).map { i =>
      val len = 3 + rnd.nextInt(10)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "b")
    }
    val df = docs.toDF("id", "text", "blk")
    val got = Dedup.containmentPairs(df, "id", "text", "blk",
        n = 3, thresholdBp = 7000L, unit = "char")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute force over distinct STRING gram sets (the hash preserves
    // distinct counts — no collisions at this scale)
    val sets = docs.map { case (i, t, _) =>
      i -> Tools.charNgramsStr(Tools.normalizeStr(t), 3).toSet }.toMap
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      sa = sets(a); sb = sets(b) if sa.nonEmpty && sb.nonEmpty
      bp = sa.intersect(sb).size.toLong * 10000L / math.min(sa.size, sb.size)
      if bp >= 7000L
    } yield (a, b) -> bp).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("cell-scoped compaction rewrites ONLY touched cells; DELETE " +
      "tombstones suppress probes (built and streamed) and purge at " +
      "the fold; writer-exclusion markers refuse interleaving") {
    import graft.streaming.EventStream
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") % 100 === 0)
    val idx = scratch("ivfcell")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idx, nlist = 8)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def cellFiles(): Map[String, Set[String]] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/assigned")).toSeq
        .filter(_.isDirectory).map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath).toSeq
            .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
        }.toMap
    // stream a SMALL batch (4 shifted-id twins of corpus vectors) — it
    // lands in a strict subset of the 8 cells, which is what makes the
    // fold's cell-scoping observable
    val pre = Ann.loadIndexGeometry(spark, idx, "spec")
    val b = e.filter(col("vec_id") < 4)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    EventStream.appendIvfBatch(b, idx, "vec_id", "embedding", "cc", 0, pre)
    val streamCells = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$idx/stream/__stream=cc/__epoch=0")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    // tombstone one BUILT id and one STREAMED id — the streamed one
    // must vanish from probes before any fold ever runs
    val victimBuilt = 17L
    val victimStreamed = 1000001L
    Ann.deleteFromIvfIndex(
      Seq(victimBuilt, victimStreamed).toDF("vec_id"), "vec_id", idx)
    val probedDf = Ann.ivfIndexTopK(spark, idx, q,
      "vec_id", "embedding", k = 5, nprobe = 8)
    val probed = probedDf.select("neighbor_id").as[Long].collect().toSet
    assert(!probed.contains(victimBuilt) && !probed.contains(victimStreamed),
      "tombstoned ids still probe-visible before the fold")
    // plan shape: the tombstone filter must be a BROADCAST anti-join
    // (deletes are declared-small — a shuffled anti would re-exchange
    // the corpus), and it must not cost the probe its partition
    // pruning
    val probePlan = probedDf.queryExecution.executedPlan.toString
    assert(probePlan.contains("BroadcastHashJoin") &&
      probePlan.toLowerCase.contains("leftanti"),
      s"tombstone anti-join is not broadcast:\n$probePlan")
    val prunedPlan = Ann.ivfIndexTopK(spark, idx, q,
        "vec_id", "embedding", k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(prunedPlan.toLowerCase.contains("dynamicpruning"),
      s"tombstoned probe lost dynamic partition pruning:\n$prunedPlan")
    // ...while un-deleted streamed twins ARE reachable (vec_id 0's
    // identical twin 1000000 sits at its query's top rank)
    assert(probed.contains(1000000L),
      "a live streamed row should be probe-visible")
    // expected touched set = stream cells ∪ the tombstoned built id's
    // cell (the streamed victim's cell is a stream cell already)
    val victimCell = "__cell=" + spark.read.parquet(s"$idx/assigned")
      .filter(col("neighbor_id") === victimBuilt)
      .select("__cell").as[Int].head()
    val expectedTouched = streamCells + victimCell
    assert(expectedTouched.size < 8,
      s"fixture degenerate — every cell touched ($expectedTouched); " +
        "cell-scoping unobservable")
    val before = cellFiles()
    Ann.compactIvfIndex(spark, idx)
    val after = cellFiles()
    val changed = (before.keySet ++ after.keySet).filter(c =>
      before.get(c) != after.get(c))
    assert(changed == expectedTouched,
      s"fold rewrote $changed, expected exactly $expectedTouched — " +
        "cell-scoping broken (O(index) rewrite, the r13 scale finding)")
    // purge is PHYSICAL in the reader-visible view: tombstoned rows
    // gone from the live file set (openAssignedRaw excludes the
    // replaced files, which stay on disk as r15 dead-file grace)
    val idsAfter = Ann.openAssignedRaw(spark, idx)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!idsAfter.contains(victimBuilt) &&
      !idsAfter.contains(victimStreamed) && idsAfter.contains(1000000L),
      "fold failed to purge tombstones (or dropped a live streamed row)")
    // the manifest names the replaced files dead, and they survive on
    // disk through the grace window
    val deadAfter = Ann.readManifest(spark, idx).get.deadFiles
    assert(deadAfter.nonEmpty, "the purge left no dead-file grace list")
    deadAfter.foreach { rel =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/assigned/$rel")),
        s"dead file $rel must survive on disk through the grace")
    }
    // the folded epoch dirs and the retained tombstone (the streamed
    // victim's bytes still sit in the graced dir — the hard-erasure
    // reading of the retention rule) both stand until the next entry
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream")),
      "the purge must RETAIN folded epoch dirs one cycle (probe grace)")
    val mf = Ann.readManifest(spark, idx).get
    assert(mf.rows == e.count() + 4 - 2, mf.toString)
    val probedAfter = Ann.ivfIndexTopK(spark, idx, q,
        "vec_id", "embedding", k = 5, nprobe = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!probedAfter.contains(victimBuilt) &&
      !probedAfter.contains(victimStreamed),
      "purged ids resurfaced after the fold")
    // the next maintenance entry collects the grace: dead files,
    // graced epoch dirs, and the then-fully-purged tombstones all go
    Ann.compactIvfIndex(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/deletes")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream")),
      "the next entry left deletes/ or stream/ behind")
    deadAfter.foreach { rel =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/assigned/$rel")),
        s"dead file $rel must be collected by the next entry")
    }
    val probedCollected = Ann.ivfIndexTopK(spark, idx, q,
        "vec_id", "embedding", k = 5, nprobe = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(probedCollected == probedAfter,
      "grace collection changed the probe's answer")
    // tombstones alone (no streamed rows) also fold: only the
    // victim's cell is rewritten
    val victim2 = 23L
    val victim2Cell = "__cell=" + spark.read.parquet(s"$idx/assigned")
      .filter(col("neighbor_id") === victim2)
      .select("__cell").as[Int].head()
    Ann.deleteFromIvfIndex(Seq(victim2).toDF("vec_id"), "vec_id", idx)
    val before2 = cellFiles()
    Ann.compactIvfIndex(spark, idx)
    val after2 = cellFiles()
    val changed2 = (before2.keySet ++ after2.keySet).filter(c =>
      before2.get(c) != after2.get(c))
    assert(changed2 == Set(victim2Cell),
      s"tombstone-only fold rewrote $changed2, expected $victim2Cell")
    Ann.compactIvfIndex(spark, idx) // collect victim2's grace files
    // unknown-id tombstones are legal and consumed without a rewrite
    Ann.deleteFromIvfIndex(Seq(999999999L).toDF("vec_id"), "vec_id", idx)
    val before3 = cellFiles()
    Ann.compactIvfIndex(spark, idx)
    assert(cellFiles() == before3,
      "an unmatched tombstone caused a rewrite")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/deletes")),
      "an unmatched tombstone was not consumed")
    // WRITER EXCLUSION (single-maintenance-writer contract): a fold's
    // marker refuses a concurrent batch append, and vice versa — the
    // interleaving would silently lose appended rows at swap time
    val compactingP = new org.apache.hadoop.fs.Path(s"$idx/_COMPACTING")
    fs.create(compactingP, true).close()
    val eApp = intercept[IllegalArgumentException](
      Ann.appendIvfIndex(b, "vec_id", "embedding", idx))
    assert(eApp.getMessage.contains("compaction"), eApp.getMessage)
    fs.delete(compactingP, false)
    val appendingP = new org.apache.hadoop.fs.Path(s"$idx/_APPENDING")
    fs.create(appendingP, true).close()
    Ann.deleteFromIvfIndex(Seq(29L).toDF("vec_id"), "vec_id", idx)
    val eCmp = intercept[IllegalArgumentException](
      Ann.compactIvfIndex(spark, idx))
    assert(eCmp.getMessage.contains("append"), eCmp.getMessage)
    // same-verb exclusion (atomic create-if-absent, r14 verdict #1):
    // a second append refuses while the first's marker stands —
    // previously both shared an overwritten marker and the first
    // finisher deleted it out from under the second
    val eApp2 = intercept[IllegalArgumentException](
      Ann.appendIvfIndex(b, "vec_id", "embedding", idx))
    assert(eApp2.getMessage.contains("another append"), eApp2.getMessage)
    // the auto-compaction policy DEFERS (returns false) under a live
    // maintenance marker instead of throwing — it rides stream
    // micro-batches, where the refusal would kill the query
    assert(!Ann.maybeCompactIvfIndex(spark, idx, afterEpochs = Some(1)),
      "maybeCompactIvfIndex did not defer under _APPENDING")
    fs.delete(appendingP, false)
    Ann.compactIvfIndex(spark, idx) // consume the pending tombstone
    // a rebuild clears stale tombstones with the stream table (the
    // new corpus is the caller's authority on membership)
    Ann.deleteFromIvfIndex(Seq(31L).toDF("vec_id"), "vec_id", idx)
    Ann.writeIvfIndex(e, "vec_id", "embedding", idx, nlist = 8)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/deletes")),
      "rebuild left stale tombstones")
    assert(Ann.ivfIndexTopK(spark, idx, e.filter(col("vec_id") === 31L),
        "vec_id", "embedding", k = 1, nprobe = 8, excludeSelf = false)
      .filter(col("neighbor_id") === 31L).count() > 0,
      "a stale tombstone suppressed a rebuilt row")
    // the QUANTIZED layouts execute the same openIvfIndex anti-join
    // (q136 gates the float probe; this runs the SQ8 and PQ probes
    // with live tombstones — the shared-opener claim, executed):
    // an identical-twin query must find its twin at rank 1 until the
    // twin is tombstoned, then never
    for ((quant, build, probe) <- Seq[(String,
        String => Unit, (String, org.apache.spark.sql.DataFrame) =>
          org.apache.spark.sql.DataFrame)](
      ("sq8",
        (p: String) => Ann.writeIvfIndex(e, "vec_id", "embedding", p,
          nlist = 4, quantize = true),
        (p: String, qs: org.apache.spark.sql.DataFrame) =>
          Ann.ivfIndexTopKQuantized(spark, p, qs, "vec_id", "embedding",
            k = 1, nprobe = 4, excludeSelf = false)),
      ("pq",
        (p: String) => Ann.writeIvfIndexPq(e, "vec_id", "embedding", p,
          nlist = 4, m = 4, ksub = 8),
        (p: String, qs: org.apache.spark.sql.DataFrame) =>
          Ann.ivfIndexTopKPq(spark, p, qs, "vec_id", "embedding",
            k = 1, nprobe = 4, excludeSelf = false)))) {
      val p = scratch(s"ivfdel-$quant")
      build(p)
      val self = e.filter(col("vec_id") === 17L)
      assert(probe(p, self).filter(col("neighbor_id") === 17L)
        .count() > 0, s"$quant: pre-delete self-probe missed")
      Ann.deleteFromIvfIndex(Seq(17L).toDF("vec_id"), "vec_id", p)
      assert(probe(p, self).filter(col("neighbor_id") === 17L)
        .isEmpty, s"$quant: a tombstoned id is still probe-visible")
    }
  }

  test("maybeCompactIvfIndex: folds when the backlog crosses the " +
      "declared threshold, never below it") {
    import graft.streaming.EventStream
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val idx = scratch("ivfauto")
    Ann.writeIvfIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", idx, nlist = 4)
    val pre = Ann.loadIndexGeometry(spark, idx, "spec")
    val odd = e.filter(col("vec_id") % 2 =!= 0).limit(30)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val streamP = new org.apache.hadoop.fs.Path(s"$idx/stream")
    EventStream.appendIvfBatch(odd, idx, "vec_id", "embedding", "aa", 0, pre)
    EventStream.appendIvfBatch(odd, idx, "vec_id", "embedding", "aa", 1, pre)
    // no policy → never folds; below threshold → not folded
    assert(!Ann.maybeCompactIvfIndex(spark, idx))
    assert(!Ann.maybeCompactIvfIndex(spark, idx, afterEpochs = Some(3)))
    assert(fs.exists(streamP), "policy folded below its threshold")
    // crossing the epoch threshold folds (the folded dirs linger one
    // cycle as probe grace, marks-invisible — liveness is the marks)
    EventStream.appendIvfBatch(odd, idx, "vec_id", "embedding", "aa", 2, pre)
    assert(Ann.maybeCompactIvfIndex(spark, idx, afterEpochs = Some(3)))
    assert(Ann.readManifest(spark, idx).get.streamMarks == Map("aa" -> 2L),
      "policy did not fold at its threshold")
    assert(!Ann.maybeCompactIvfIndex(spark, idx, afterEpochs = Some(1)),
      "graced (already-folded) dirs re-tripped the epoch policy")
    // rows_pct: one small epoch ≪ 50% of main rows → below; a tiny
    // threshold → folds
    EventStream.appendIvfBatch(odd, idx, "vec_id", "embedding", "aa", 3, pre)
    assert(!Ann.maybeCompactIvfIndex(spark, idx,
      afterRowsPct = Some(50.0)))
    assert(Ann.maybeCompactIvfIndex(spark, idx,
      afterRowsPct = Some(0.001)))
    assert(Ann.readManifest(spark, idx).get.streamMarks == Map("aa" -> 3L))
    // nothing pending → cheap false, regardless of policy
    assert(!Ann.maybeCompactIvfIndex(spark, idx, afterEpochs = Some(1)))
    // END-TO-END through the streaming sink: three single-file
    // micro-batches under compactAfterEpochs=2 — the fold fires INSIDE
    // foreachBatch when the backlog hits 2, leaving at most the
    // below-threshold remainder in stream/, with the probe still
    // answering over every row (folded ∪ still-streaming union)
    val idx2 = scratch("ivfauto-stream")
    Ann.writeIvfIndex(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", idx2, nlist = 4)
    val inDir = scratch("ivfauto-in")
    val oddAll = e.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding")
    oddAll.repartition(3).write.mode("overwrite").parquet(inDir)
    val sq = graft.streaming.EventStream.appendIvfIndexStream(
      spark.readStream.schema(oddAll.schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir),
      idx2, "vec_id", "embedding",
      checkpoint = scratch("ivfauto-ck") + "/ck",
      compactAfterEpochs = Some(2))
    sq.processAllAvailable(); sq.stop()
    val mfS = Ann.readManifest(spark, idx2).get
    assert(mfS.streamMarks.nonEmpty,
      "the in-stream policy never folded (no watermark recorded)")
    // unfolded epochs must be BELOW threshold
    // LIVE (above-watermark) backlog only: folded dirs linger one
    // cycle as probe grace and do not count against the policy
    val liveDirs =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$idx2/stream"))) 0
      else fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx2/stream"))
        .filter(_.isDirectory).flatMap { d =>
          val tag = d.getPath.getName.stripPrefix("__stream=")
          fs.listStatus(d.getPath).filter(_.isDirectory).map(ed =>
            (tag, ed.getPath.getName.stripPrefix("__epoch=").toLong))
        }.count { case (tag, ep) =>
          !mfS.streamMarks.get(tag).exists(ep <= _) }
    assert(liveDirs < 2,
      s"live backlog of $liveDirs epochs survived a compactAfterEpochs=2 sink")
    val viaAuto = Ann.ivfIndexTopK(spark, idx2,
      e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
      k = 5, nprobe = 4)
    val idx2Full = scratch("ivfauto-reb")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idx2Full, nlist = 4)
    val viaRebuild2 = Ann.ivfIndexTopK(spark, idx2Full,
      e.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
      k = 5, nprobe = 4)
    assert(viaAuto.exceptAll(viaRebuild2).count() == 0 &&
      viaRebuild2.exceptAll(viaAuto).count() == 0,
      "auto-compacted stream diverged from the full rebuild")
  }

  test("deleteFromNearDupIndex: tombstoned corpus docs stop vetoing; " +
      "rebuild purges the tombstones") {
    val tpl = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq((1L, tpl), (2L, "completely different corpus text " +
      "about census records and parquet files")).toDF("doc_id", "text")
    val batch = Seq((10L, tpl)).toDF("doc_id", "text")
    val idx = scratch("neardup-del")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idx)
    def verdict(): (Long, Boolean) =
      Dedup.incrementalNearDupsIndexed(batch, idx, "doc_id", "text")
        .select("n_corpus_dups", "kept").collect().map(r =>
          (r.getLong(0), r.getBoolean(1))).head
    assert(verdict() == ((1L, false)), "clone should be vetoed pre-delete")
    // the streaming ingest gate DROPS flagged rows, so it must shed a
    // taken-down doc's buckets too — a stale tombstoned doc would
    // otherwise silently destroy new arrivals resembling it
    def gateFlag(): Boolean =
      graft.streaming.EventStream.nearDupFlagsStream(batch, idx, "text")
        .select("maybe_near_dup").collect().head.getBoolean(0)
    assert(gateFlag(), "gate should flag the clone pre-delete")
    Dedup.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), "doc_id", idx)
    assert(verdict() == ((0L, true)),
      "a tombstoned corpus doc kept vetoing its clones")
    assert(!gateFlag(),
      "the streaming gate kept flagging a tombstoned doc's buckets")
    // idempotent / unknown ids are legal
    Dedup.deleteFromNearDupIndex(Seq(1L, 777L).toDF("doc_id"), "doc_id", idx)
    assert(verdict() == ((0L, true)))
    // rebuild purges: the doc is back (it is in the corpus again) and
    // deletes/ is gone
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idx)
    val delP = new org.apache.hadoop.fs.Path(s"$idx/deletes")
    assert(!delP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(delP), "rebuild left stale tombstones")
    assert(verdict() == ((1L, false)))
  }

  test("appendToNearDupIndex: append ≡ rebuild under the STORED signature; " +
      "writer-exclusion markers; file-scoped compact; auto-purge policy") {
    val tpl = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = ((1L to 8L).map(i =>
        (i, s"corpus document number $i about census topic ${i % 3} " +
          "with a few more words of text")) :+ (9L, tpl))
      .toDF("doc_id", "text")
    val batch = Seq((100L, tpl)).toDF("doc_id", "text")
    val part1 = corpus.filter(col("doc_id") % 2 === 1)
    val part2 = corpus.filter(col("doc_id") % 2 === 0)
    def verdicts(idx: String) =
      Dedup.incrementalNearDupsIndexed(batch, idx, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toSet

    // non-default signature (60 hashes × 10 bands): an append that
    // re-signed under the 64/16 defaults would band-mismatch every
    // probe, so append ≡ rebuild pins the stored-signature discipline
    val apx = scratch("neardup-apnd")
    Dedup.writeNearDupIndex(part1, "doc_id", "text", apx,
      shingleSize = 3, numHashes = 60, bands = 10)
    Dedup.appendToNearDupIndex(part2, "doc_id", "text", apx)
    val reb = scratch("neardup-apnd-reb")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", reb,
      shingleSize = 3, numHashes = 60, bands = 10)
    assert(verdicts(apx) == verdicts(reb), "append diverged from rebuild")
    // incremental row accounting: certified + batch, no table re-list
    assert(Dedup.readNearDupManifest(spark, apx).map(_._4) ==
      Dedup.readNearDupManifest(spark, reb).map(_._4))

    // appends extend a COMPLETE index — no manifest is a loud refusal
    val noIdx = intercept[RuntimeException](Dedup.appendToNearDupIndex(
      part2, "doc_id", "text", scratch("neardup-apnd-none")))
    assert(noIdx.getMessage.contains("manifest"), noIdx.getMessage)

    // single-maintenance-writer, both directions: each verb refuses
    // while the other's marker exists (interleaved, the fold's file
    // swap could delete freshly appended rows)
    val fs = new org.apache.hadoop.fs.Path(apx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val compacting = new org.apache.hadoop.fs.Path(s"$apx/_COMPACTING")
    fs.create(compacting, true).close()
    val r1 = intercept[IllegalArgumentException](
      Dedup.appendToNearDupIndex(part2, "doc_id", "text", apx))
    assert(r1.getMessage.contains("_COMPACTING"), r1.getMessage)
    fs.delete(compacting, false)
    Dedup.deleteFromNearDupIndex(Seq(9L).toDF("doc_id"), "doc_id", apx)
    val appending = new org.apache.hadoop.fs.Path(s"$apx/_APPENDING")
    fs.create(appending, true).close()
    val r2 = intercept[IllegalArgumentException](
      Dedup.compactNearDupIndex(spark, apx))
    assert(r2.getMessage.contains("_APPENDING"), r2.getMessage)
    // same-verb exclusion (atomic create-if-absent, r14 verdict #1)
    val r3 = intercept[IllegalArgumentException](
      Dedup.appendToNearDupIndex(part2, "doc_id", "text", apx))
    assert(r3.getMessage.contains("another append"), r3.getMessage)
    // the auto-purge policy DEFERS (returns false) under a live
    // maintenance marker instead of throwing (it rides stream
    // micro-batches and YAML delete boundaries)
    assert(!Dedup.maybeCompactNearDupIndex(spark, apx,
        afterDeletes = Some(1L)),
      "maybeCompactNearDupIndex did not defer under _APPENDING")
    fs.delete(appending, false)

    // file-scoped fold: files holding no tombstoned row are never read
    // again nor rewritten (same name, same mtime) — the O(touched
    // files) claim, concretely
    def files(table: String): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$apx/$table")).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val doomedF = spark.read.parquet(s"$apx/shingles")
      .select(col("__cid"), col("_metadata.file_path").as("f"))
      .filter(col("__cid") === 9L)
      .select("f").distinct().collect()
      .map(_.getString(0).split("/").last).toSet
    assert(doomedF.nonEmpty)
    val before = files("shingles")
    val rowsBefore = Dedup.readNearDupManifest(spark, apx).get._4
    Dedup.compactNearDupIndex(spark, apx)
    val after = files("shingles")
    assert((before.keySet -- doomedF).forall(f => after.get(f) == before.get(f)),
      "an untouched file was rewritten by the file-scoped fold")
    // r15 dead-file grace: the replaced files SURVIVE this purge on
    // disk (readers in flight finish against them), the manifest
    // names them dead (openers exclude them), and the NEXT
    // maintenance entry collects them physically
    assert(doomedF.forall(f => after.contains(f)),
      "a doomed file was deleted in-place instead of riding the grace")
    assert(Dedup.readNearDupDead(spark, apx)
        .getOrElse("shingles", Nil).toSet == doomedF,
      "the manifest's dead list must name exactly the replaced files")
    // tombstones consumed, accounting decremented, probe ≡ a rebuild
    // on the survivors — the post-purge index IS the smaller corpus
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$apx/deletes")),
      "the fold did not consume its tombstones")
    assert(Dedup.readNearDupManifest(spark, apx).get._4 == rowsBefore - 1)
    val reb2 = scratch("neardup-apnd-reb2")
    Dedup.writeNearDupIndex(corpus.filter(col("doc_id") =!= 9L),
      "doc_id", "text", reb2, shingleSize = 3, numHashes = 60, bands = 10)
    assert(verdicts(apx) == verdicts(reb2),
      "post-compact probe diverged from a rebuild on the survivors")
    // the next maintenance entry — a no-op compact — collects the
    // grace files and clears the manifest's dead list
    Dedup.compactNearDupIndex(spark, apx)
    assert(doomedF.forall(f => !files("shingles").contains(f)),
      "the next entry must collect the dead files physically")
    assert(Dedup.readNearDupDead(spark, apx).values.flatten.isEmpty,
      "the next entry must clear the dead list")
    assert(verdicts(apx) == verdicts(reb2),
      "dead-file collection changed the probe's answer")

    // auto-purge policy: below the threshold nothing folds; at it, the
    // backlog purges and the tombstone table is consumed
    Dedup.deleteFromNearDupIndex(Seq(1L).toDF("doc_id"), "doc_id", apx)
    assert(!Dedup.maybeCompactNearDupIndex(spark, apx,
      afterDeletes = Some(2L)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$apx/deletes")),
      "policy folded below its threshold")
    Dedup.deleteFromNearDupIndex(Seq(3L).toDF("doc_id"), "doc_id", apx)
    assert(Dedup.maybeCompactNearDupIndex(spark, apx,
      afterDeletes = Some(2L)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$apx/deletes")))
    // the pct variant: one tombstone over the 6 surviving docs is
    // ~17% — below a 50% threshold the backlog stays, past a 10% one
    // it folds
    Dedup.deleteFromNearDupIndex(Seq(5L).toDF("doc_id"), "doc_id", apx)
    assert(!Dedup.maybeCompactNearDupIndex(spark, apx,
      afterDeletesPct = Some(50.0)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$apx/deletes")),
      "pct policy folded below its threshold")
    assert(Dedup.maybeCompactNearDupIndex(spark, apx,
      afterDeletesPct = Some(10.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$apx/deletes")))
  }

  test("band-index stream append: union-visible epochs, at-least-once " +
      "idempotency, marks skip, fold accounting, drift tripwire") {
    val tpl = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 8L).map(i =>
        (i, s"corpus document number $i about census topic ${i % 3} " +
          "with a few more words of text")).toDF("doc_id", "text")
    val arriving = Seq((20L, tpl),
      (21L, "a wholly novel streamed document about trains and stations"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, tpl)).toDF("doc_id", "text")
    val idx = scratch("neardup-stream")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idx)
    val pre = (3, 64, 16)
    def verdict(): (Long, Boolean) =
      Dedup.incrementalNearDupsIndexed(batch, idx, "doc_id", "text")
        .select("n_corpus_dups", "kept").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).head
    assert(verdict() == ((0L, true)), "template pre-planted?")
    // an epoch lands → probe-visible immediately through the union
    Dedup.appendNearDupStreamBatch(arriving, idx, "doc_id", "text",
      "tagA", 0L, pre)
    assert(verdict() == ((1L, false)), "streamed epoch invisible to probe")
    // at-least-once: the same (tag, epoch) twice never doubles
    Dedup.appendNearDupStreamBatch(arriving, idx, "doc_id", "text",
      "tagA", 0L, pre)
    assert(verdict() == ((1L, false)), "epoch replay doubled its rows")
    // a later epoch still appends
    Dedup.appendNearDupStreamBatch(Seq((22L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagA", 1L, pre)
    assert(verdict() == ((2L, false)))
    // the fold consumes the epochs, records the watermark, adds the
    // rows to the certified count, and the verdicts cannot change
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rowsBefore = Dedup.readNearDupManifest(spark, idx).get._4
    Dedup.compactNearDupIndex(spark, idx)
    // folded epoch dirs are RETAINED one fold cycle (r15 probe grace,
    // marks-invisible); the second fold's entry collection removes them
    Seq("stream_shingles", "stream_bands").foreach(t =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/$t")),
        s"grace: $t should linger under the watermark"))
    assert(Dedup.readNearDupMarks(spark, idx) == Map("tagA" -> 1L))
    assert(Dedup.readNearDupManifest(spark, idx).get._4 == rowsBefore + 3)
    assert(verdict() == ((2L, false)), "the fold changed the verdicts")
    Dedup.compactNearDupIndex(spark, idx)
    Seq("stream_shingles", "stream_bands").foreach(t =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/$t")),
        s"the second fold did not collect $t's graced dirs"))
    // a FOLDED epoch's replay is skipped against the marks — no
    // resurrection, no double
    Dedup.appendNearDupStreamBatch(arriving, idx, "doc_id", "text",
      "tagA", 1L, pre)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream_shingles")),
      "a folded epoch's replay resurrected its dir")
    assert(verdict() == ((2L, false)))
    // mid-stream rebuild tripwire: a drifted stream-start signature
    // refuses instead of mixing mis-signed rows in
    val e = intercept[IllegalArgumentException](
      Dedup.appendNearDupStreamBatch(arriving, idx, "doc_id", "text",
        "tagA", 2L, (3, 60, 10)))
    assert(e.getMessage.contains("REBUILT"), e.getMessage)
    // admit-gate replay determinism: the probe with the batch's OWN
    // (tag, epoch) carved out cannot be vetoed by its previous
    // incarnation, while the plain probe sees it
    Dedup.appendNearDupStreamBatch(Seq((25L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagB", 5L, pre)
    assert(verdict() == ((3L, false)))
    val excl = Dedup.incrementalNearDupsIndexedImpl(batch, idx,
        "doc_id", "text", 0.6, None, excludeEpoch = Some(("tagB", 5L)))
      .select("n_corpus_dups").collect().head.getLong(0)
    assert(excl == 2L, "excludeEpoch did not carve the epoch out")
    // auto-fold policy on the stream backlog: below the threshold
    // nothing folds, at it the backlog folds
    assert(!Dedup.maybeCompactNearDupIndex(spark, idx,
      afterEpochs = Some(2)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream_shingles")))
    Dedup.appendNearDupStreamBatch(Seq((26L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagB", 6L, pre)
    assert(Dedup.maybeCompactNearDupIndex(spark, idx,
      afterEpochs = Some(2)))
    // the graced dirs linger but are marks-invisible: the policy sees
    // zero LIVE epochs and does not re-trip
    assert(!Dedup.maybeCompactNearDupIndex(spark, idx,
      afterEpochs = Some(1)),
      "graced (already-folded) dirs re-tripped the epoch policy")
    assert(verdict() == ((4L, false)))
  }

  test("compactNearDupIndex: a torn epoch (shingles landed, crash before " +
      "bands) is never folded half-written nor marked — the replay heals " +
      "it; foreign stream-tag dirs refuse loudly") {
    val tpl = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 6L).map(i =>
        (i, s"corpus document number $i about census topic ${i % 3} " +
          "with a few more words of text")).toDF("doc_id", "text")
    val idx = scratch("neardup-torn")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idx)
    val pre = (3, 64, 16)
    def verdict(): (Long, Boolean) =
      Dedup.incrementalNearDupsIndexed(
          Seq((100L, tpl)).toDF("doc_id", "text"), idx, "doc_id", "text")
        .select("n_corpus_dups", "kept").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).head
    // complete epoch 0 lands through the real batch core
    Dedup.appendNearDupStreamBatch(Seq((40L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagC", 0L, pre)
    // forge a TORN epoch 1: shingles landed, crash before bands (copy
    // epoch 0's shingle rows under a new id — the exact schema)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$idx/stream_shingles/__stream=tagC/__epoch=0")
      .withColumn("__cid", org.apache.spark.sql.functions.lit(41L))
      .write.mode("overwrite")
      .parquet(s"$idx/stream_shingles/__stream=tagC/__epoch=1")
    assert(verdict() == ((1L, false)),
      "pre-fold: the torn doc must be invisible, the complete one visible")
    Dedup.compactNearDupIndex(spark, idx)
    // epoch 0 folded + marked; the torn epoch survives UNTOUCHED and
    // UNMARKED (deleting it could race a live batch mid-write; marking
    // it would permanently block the healing replay)
    assert(Dedup.readNearDupMarks(spark, idx) == Map("tagC" -> 0L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$idx/stream_shingles/__stream=tagC/__epoch=1")),
      "the fold consumed a torn epoch")
    assert(verdict() == ((1L, false)), "fold changed the verdicts")
    // the restarted stream's at-least-once replay heals the epoch
    // (its offset never committed), and the next fold takes it
    Dedup.appendNearDupStreamBatch(Seq((41L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagC", 1L, pre)
    assert(verdict() == ((2L, false)), "healed epoch invisible")
    Dedup.compactNearDupIndex(spark, idx)
    assert(Dedup.readNearDupMarks(spark, idx) == Map("tagC" -> 1L))
    Dedup.compactNearDupIndex(spark, idx) // collect the graced dirs
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream_shingles")))
    assert(verdict() == ((2L, false)))
    // a foreign (non-alphanumeric) stream-tag dir refuses loudly: the
    // manifest sanitizes mark keys, so its watermark could never match
    // and every fold would re-append its rows forever
    spark.read.parquet(s"$idx/shingles").limit(1)
      .write.mode("overwrite")
      .parquet(s"$idx/stream_shingles/__stream=bad-tag/__epoch=0")
    val e = intercept[IllegalArgumentException](verdict())
    assert(e.getMessage.contains("non-alphanumeric"), e.getMessage)
  }

  test("compactNearDupIndex retains tombstones whose ids live only in a " +
      "remaining stream epoch — the takedown survives to the healing fold") {
    // the r14-advice blind spot: a takedown lands while its id's only
    // rows sit in a TORN stream epoch (or one landed after the fold's
    // snapshot). The purge finds nothing doomed in the main tables;
    // consuming the tombstone would let the healed epoch's later fold
    // resurrect the id with nothing left to suppress it.
    val tpl = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 6L).map(i =>
        (i, s"corpus document number $i about census topic ${i % 3} " +
          "with a few more words of text")).toDF("doc_id", "text")
    val idx = scratch("neardup-retain")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idx)
    val pre = (3, 64, 16)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // doc 50 lands, then the tear is forged: bands vanish (crash
    // between the sink's two table writes) — 50 now lives ONLY in the
    // torn stream_shingles epoch
    Dedup.appendNearDupStreamBatch(Seq((50L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagD", 0L, pre)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$idx/stream_bands/__stream=tagD/__epoch=0"), true)
    Dedup.deleteFromNearDupIndex(Seq(50L).toDF("doc_id"), "doc_id", idx)
    Dedup.compactNearDupIndex(spark, idx)
    val left = spark.read.parquet(s"$idx/deletes")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(50L),
      s"the fold consumed (or lost) the still-live tombstone: $left")
    // the restarted stream heals the epoch (both tables), the next
    // fold banks it — and the RETAINED tombstone purges it right there
    Dedup.appendNearDupStreamBatch(Seq((50L, tpl)).toDF("doc_id", "text"),
      idx, "doc_id", "text", "tagD", 0L, pre)
    Dedup.compactNearDupIndex(spark, idx)
    // reader-visible rows: the opener excludes the purge's dead grace
    // files (the raw dir still holds them for in-flight readers)
    assert(Dedup.openNearDupTable(spark, idx, "shingles")
        .filter(col("__cid") === 50L).count() == 0,
      "the healed epoch resurrected the taken-down id")
    assert(Dedup.openNearDupTable(spark, idx, "bands")
        .filter(col("__cid") === 50L).count() == 0)
    // the graced (folded, marks-invisible) epoch dir still holds 50's
    // bytes, so the tombstone stands until the grace collection — the
    // hard-erasure reading of the retention rule
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/deletes")),
      "tombstone consumed while the graced dir still held the id's bytes")
    Dedup.compactNearDupIndex(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/deletes")),
      "a fully-purged tombstone was not consumed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/stream_shingles")),
      "the grace collection left the healed epoch's dir behind")
  }

  test("Ann.retainStreamTombstones re-writes exactly the tombstones " +
      "still matching a remaining stream epoch's rows") {
    // the ANN twin of the blind spot is a mid-call race (an epoch
    // landing between the fold's snapshot and its tombstone
    // consumption — not deterministically injectable), so the
    // retention helper is pinned directly: given a snapshot of
    // tombstones {17, 999} and a remaining epoch holding only 17's
    // rows, it must re-write 17 and nothing else, BEFORE the caller
    // consumes the snapshot files.
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") < 64)
    val idx = scratch("ivf-retain")
    Ann.writeIvfIndex(e, "vec_id", "embedding", idx, nlist = 4)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a remaining (post-snapshot) epoch holding id 17's row — the
    // sink's real layout: stream/__stream=tag/__epoch=N
    spark.read.parquet(s"$idx/assigned")
      .filter(col("neighbor_id") === 17L)
      .write.mode("overwrite")
      .parquet(s"$idx/stream/__stream=zz/__epoch=5")
    Ann.deleteFromIvfIndex(Seq(17L, 999L).toDF("vec_id"), "vec_id", idx)
    val delDir = new org.apache.hadoop.fs.Path(s"$idx/deletes")
    val snapshot = fs.listStatus(delDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val dels = spark.read.parquet(snapshot.map(_.toString): _*)
      .select(col("neighbor_id").as("__del_id")).distinct()
    Ann.retainStreamTombstones(spark, fs, idx, dels)
    snapshot.foreach(f => fs.delete(f, false))
    val left = spark.read.parquet(delDir.toString)
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(17L),
      s"retained $left — expected exactly the still-live id 17")
  }

  test("nearDupAdmitStream: admits novel docs, remembers them across " +
      "micro-batches, near-dedups within a batch, refuses a fresh " +
      "checkpoint over leftover epochs") {
    import graft.streaming.EventStream
    val tplA = "completely fresh template alpha about streaming near " +
      "duplicate admission checks"
    val tplB = "another unrelated template bravo describing batch " +
      "internal deduplication behavior"
    val corpus = (1L to 6L).map(i =>
        (i, s"corpus document number $i about census topic ${i % 3} " +
          "with a few more words of text")).toDF("doc_id", "text")
    val idx = scratch("neardup-admit")
    Dedup.writeNearDupIndex(corpus, "doc_id", "text", idx)
    val inDir = scratch("neardup-admit-in")
    val ckpt = scratch("neardup-admit-ck")
    Seq((30L, tplA)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(inDir)
    val st = spark.readStream
      .schema(spark.read.parquet(inDir).schema).parquet(inDir)
    val q = EventStream.nearDupAdmitStream(st, idx, "doc_id", "text", ckpt)
    try {
      q.processAllAvailable() // epoch 0: 30 is novel → admitted
      // epoch 1: 31 clones the REMEMBERED 30 (cross-epoch veto);
      // 32/33 clone each other (within-batch keep-min admits 32)
      Seq((31L, tplA), (32L, tplB), (33L, tplB))
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()
    val admitted = Dedup.openNearDupTable(spark, idx, "shingles")
      .filter(col("__cid") >= 30L).select("__cid")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(30L, 32L),
      s"admitted $admitted — expected the novel doc per template only")
    // both templates now veto fresh clones
    val verd = Dedup.incrementalNearDupsIndexed(
        Seq((100L, tplA), (101L, tplB)).toDF("doc_id", "text"),
        idx, "doc_id", "text")
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verd == Map(100L -> false, 101L -> false),
      s"grown index does not veto: $verd")
    // a FRESH checkpoint over this tag's leftover epochs refuses
    val e = intercept[RuntimeException](
      EventStream.appendNearDupIndexStream(st, idx, "doc_id", "text",
        scratchFresh(ckpt)))
    assert(e.getMessage.contains("fresh"), e.getMessage)
  }

  /** Simulate a FRESH checkpoint carrying an old tag's history: the
    * refusal keys on (no committed offsets) × (leftover epochs or a
    * mark for the same tag), and the tag hashes the checkpoint PATH —
    * so strip the offsets from the original path rather than minting
    * a new one. */
  private def scratchFresh(ckpt: String): String = {
    val offs = new org.apache.hadoop.fs.Path(ckpt, "offsets")
    offs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(offs, true)
    ckpt
  }
}
