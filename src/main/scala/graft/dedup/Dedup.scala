package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Similarity, Tools}
import graft.graph.ConnectedComponents

/** Deduplication operators for large-scale training-data pipelines: exact,
  * fingerprint, MinHash+LSH, SimHash, n-gram Jaccard. All pure DataFrame
  * transforms designed so the expensive parts (signatures) are computed
  * row-local inside codegen and only candidate generation shuffles.
  */
object Dedup {

  // --------------------------------------------------------------- exact
  /** Exact dedup by content hash: one row per distinct key, keeping the
    * minimum id, plus the duplicate count. NULL texts hash to one NULL
    * group here (SQL GROUP BY semantics, matching the external oracle);
    * [[exactDedup]] deliberately does NOT treat that group as duplicates. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count("*").as("dup_count"))

  /** Drop exact duplicates, keeping the row with the minimal id per
    * content hash (deterministic, unlike dropDuplicates). Rows with NULL
    * text are all kept: a missing document is not a duplicate of every
    * other missing document (grouping them would silently drop all but
    * one of potentially millions of unrelated rows). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinPerKey(df, idCol, md5(col(textCol).cast("binary")))

  /** The survivor rule shared by the exact-key dedup family
    * ([[exactDedup]], [[fingerprintDedup]], UrlTools.urlDedup): keep
    * the min-id row per non-NULL key; NULL-key rows (missing text, a
    * URL that does not normalize) are ALL kept. ONE implementation —
    * the key-expression changes, the keeper contract cannot drift. */
  private[graft] def keepMinPerKey(df: DataFrame, idCol: String,
      key: Column): DataFrame = {
    val keyed = df.withColumn("__dedup_key", key)
    val nn = keyed.filter(col("__dedup_key").isNotNull)
    // ONE key exchange (r15): rank() = 1 over (key, id asc) keeps every
    // row whose id IS the group minimum — identical to the former
    // groupBy(min id) + semi-join shape including duplicate-id
    // multiplicity (rank, not row_number: several copies of the min-id
    // row all tie at rank 1 and all survive, exactly as the semi-join
    // kept them), for two fewer exchanges and ONE evaluation of the
    // (often regex-heavy) key expression instead of two — the semi-join
    // shape referenced `nn` twice, so fingerprint() ran per row per
    // side. WindowGroupLimit prunes each group to its leading ties
    // before the sort completes (the keepBestPerKey plan shape).
    // NULL ids reproduce the semi-join contract too (r16, the r15
    // advice): min() ignored NULLs and a NULL id never equi-joined, so
    // NULL-id rows in a keyed group were DROPPED and an all-NULL-id
    // group vanished — nulls_last keeps them off rank 1 in mixed
    // groups, and the isNotNull conjunct drops the all-NULL groups the
    // window would otherwise rank first.
    val w = Window.partitionBy(col("__dedup_key"))
      .orderBy(col(idCol).asc_nulls_last)
    nn.withColumn("__rk", rank().over(w))
      .filter(col("__rk") === 1 && col(idCol).isNotNull)
      .drop("__rk")
      .unionByName(keyed.filter(col("__dedup_key").isNull))
      .drop("__dedup_key")
  }

  /** Quality-aware survivor rule: keep the row with the HIGHEST
    * `scoreCol` per non-NULL key (ties → min id; NULL scores sort
    * last, so an all-NULL-score group still keeps its min id) — "keep
    * the canonical best", the survivor policy real curation pipelines
    * want once a quality score exists (a crawl dup and its cleaner
    * mirror are the same key; min-id keeps whichever was ingested
    * first, this keeps the better one). NULL-key rows are ALL kept,
    * the family-wide contract.
    *
    * ONE shuffle on the key; WindowGroupLimit prunes each group to its
    * single survivor before the per-partition sort completes (the
    * capPerKey plan shape), so a million-row duplicate group never
    * materializes sorted. */
  private[graft] def keepBestPerKey(df: DataFrame, idCol: String,
      key: Column, scoreCol: String): DataFrame = {
    val keyed = df.withColumn("__dedup_key", key)
    val nn = keyed.filter(col("__dedup_key").isNotNull)
    val w = Window.partitionBy(col("__dedup_key"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
    nn.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
      .unionByName(keyed.filter(col("__dedup_key").isNull))
      .drop("__dedup_key")
  }

  /** [[exactDedup]] / [[fingerprintDedup]] with the keep-best survivor
    * rule — `method` picks the key family, `scoreCol` the quality
    * column (keep max, ties → min id). */
  def dedupKeepBest(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String, method: String = "exact"): DataFrame = {
    val key = method match {
      case "exact"       => md5(col(textCol).cast("binary"))
      case "fingerprint" => fingerprint(col(textCol))
      case other => sys.error(
        s"dedupKeepBest: unknown method '$other' (exact | fingerprint)")
    }
    keepBestPerKey(df, idCol, key, scoreCol)
  }

  // --------------------------------------------------------- fingerprint
  /** Normalized fingerprint key (OpenRefine-style): normalize → tokens →
    * distinct → sort → join → md5. Near-identical docs that differ only
    * in punctuation/case/word order collapse to one key. */
  def fingerprint(c: Column): Column =
    // array_join, NOT concat_ws: concat_ws quietly turns a null token
    // array into "" (colliding every missing doc with every EMPTY doc),
    // while array_join propagates the null — and measures ~30% faster
    // than an explicit when()-guard around the whole expression
    md5(array_join(sort_array(array_distinct(Tools.tokenize(Tools.normalize(c)))), " ")
      .cast("binary"))

  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count("*").as("dup_count"))

  /** Drop fingerprint duplicates keeping the min id per key — the same
    * NULL-text contract as [[exactDedup]] (null docs are each kept). */
  def fingerprintDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinPerKey(df, idCol, fingerprint(col(textCol)))

  // --------------------------------------------------------- incremental
  /** Incremental dedup — the daily-crawl shape: dedup a NEW `batch`
    * against an already-deduped `corpus` WITHOUT re-touching corpus
    * rows. Returns the batch rows that survive: (1) whose content key
    * (exact md5 or normalized fingerprint, per `method`) appears
    * nowhere in the corpus, and (2) keeping the min-id row per key
    * within the batch itself ([[keepMinPerKey]] — NULL-text rows all
    * kept, as everywhere in this family). Appending the result to the
    * corpus preserves the corpus's dedup invariant, so a 100-TB corpus
    * is never re-deduped from scratch — each increment costs only the
    * increment.
    *
    * Scale shape, `bloomFpp = None`: the corpus contributes ONLY its
    * key column (computed map-side from the scanned text, 32 bytes a
    * row) to one anti-join exchange. With `bloomFpp = Some(p)` the
    * plan inverts around the sides' sizes (batch ≪ corpus, the premise
    * of incremental): a Bloom filter over the BATCH's keys broadcasts,
    * corpus keys that miss it — for a mostly-novel corpus, all but the
    * true overlaps — drop MAP-SIDE before any exchange, and the
    * anti-join right side shrinks to true hits + an fpp-sized trickle
    * the exact key equality then discards. Output is IDENTICAL (the
    * Bloom has no false negatives; the final join is exact on the full
    * key) — same contract as decontamination's `prefilter: bloom`
    * (q53/q68), and the corpus-side shuffle becomes corpus-INDEPENDENT:
    * ~|batch keys| + p·|corpus|. The filter build costs one bounded
    * action over the batch (the small side by definition). */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, method: String = "exact",
      bloomFpp: Option[Double] = None): DataFrame = {
    val keyOf: Column => Column = method match {
      case "exact"       => c => md5(c.cast("binary"))
      case "fingerprint" => c => fingerprint(c)
      case other => sys.error(
        s"incrementalDedup: unknown method '$other' (exact | fingerprint)")
    }
    val corpusKeys = corpus
      .select(keyOf(col(textCol)).as("__ik")).filter(col("__ik").isNotNull)
    val seen = bloomFpp match {
      case None => corpusKeys
      case Some(fpp) =>
        require(fpp > 0 && fpp < 1, s"bloom fpp must be in (0, 1), got $fpp")
        val bKeys = batch
          .select(xxhash64(keyOf(col(textCol))).as("__kh"))
          .filter(col("__kh").isNotNull)
        val n = bKeys.count()
        if (n == 0) corpusKeys.limit(0) // all-NULL batch: nothing can match
        else {
          // build on the raw key stream (put is idempotent; dups only
          // oversize → lower effective fpp), coalesced for the same
          // bit-array-merge reason as testGramBloom (measured there)
          val bf = bKeys.coalesce(8).stat.bloomFilter("__kh", n, fpp)
          val bcast = batch.sparkSession.sparkContext.broadcast(bf)
          val might = udf { (h: Long) => bcast.value.mightContainLong(h) }
          corpusKeys.filter(might(xxhash64(col("__ik"))))
        }
    }
    val novel = batch.withColumn("__ik", keyOf(col(textCol)))
      .join(seen, Seq("__ik"), "left_anti")
      .drop("__ik")
    keepMinPerKey(novel, idCol, keyOf(col(textCol)))
  }

  // ------------------------------------------------------------- MinHash
  /** MinHash signature over an already-hashed (array<long>) element set:
    * k hash functions, minhash_i = min over elements of mix(h, i).
    * One UDF pass — a tight primitive loop (k·|set| splitmix64 mixes per
    * row); the naive alternative (k separate transform+array_min column
    * expressions) generates code too large for whole-stage codegen and
    * falls back to slow interpreted eval. Row-local — no shuffle. */
  private val minhashUdf = udf { (hs: Seq[Long], k: Int) =>
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    hs.foreach { h0 =>
      var i = 0
      while (i < k) {
        var z = h0 + 0x9e3779b97f4a7c15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < out(i)) out(i) = z
        i += 1
      }
    }
    out.toSeq
  }
  def minhashSignature(hashedSet: Column, k: Int): Column =
    minhashUdf(hashedSet, lit(k))

  /** LSH banding: signature array → (band_idx, band_hash) pairs. Docs
    * sharing any band hash are candidate near-duplicates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)), lit(b))
          .as("bucket"))): _*)

  /** MinHash-LSH candidate pairs verified with true Jaccard.
    *
    * Pipeline: shingle → signature (row-local) → explode bands → self-join
    * on (band, bucket) → distinct pairs → verify true n-gram Jaccard ≥
    * threshold. At scale the band join is the only shuffle and buckets are
    * naturally balanced by the hash; AQE splits skewed buckets.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Sorted distinct hashed word-k-shingles of a token array in ONE pass.
    * A Column-side composition (transform over wordShingles over split)
    * inlines the tokenization into the lambda and re-runs it per shingle
    * index — O(tokens²) regex work per row; this UDF is the single-pass
    * replacement. Fewer-than-k tokens hash the whole token string
    * (wordShingles' contract). */
  private val shingleHashUdf = udf { (toks: Seq[String], k: Int) =>
    if (toks == null) null
    else if (toks.isEmpty) Seq.empty[Long]
    else if (toks.length < k) Seq(fnv64(toks.mkString(" ")))
    else {
      val set = scala.collection.mutable.SortedSet.empty[Long]
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        set += fnv64(sb.toString)
        i += 1
      }
      set.toSeq
    }
  }

  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    // bands > numHashes would make every band slice EMPTY (one global
    // bucket → the full n²/2 cross product); a non-divisor would
    // silently drop trailing hashes
    require(bands >= 1 && numHashes % bands == 0,
      s"bands must divide numHashes (got bands=$bands, numHashes=$numHashes)")
    val rowsPerBand = numHashes / bands
    // shingle sets as sorted hashed longs: set semantics survive, every
    // downstream compare/intersect runs on primitives instead of strings.
    // AutoUnpersist-scoped: the cache serves the band join and the verify
    // join within the caller's action, then is released (minhashDedup's
    // component iterations read ConnectedComponents' own persisted edge
    // set, not this frame, so early release costs them nothing).
    val base = graft.engine.AutoUnpersist.cache(df.select(
      col(idCol).as("id"),
      shingleHashUdf(Tools.tokenize(Tools.normalize(col(textCol))), lit(shingleSize))
        .as("shingles"))
      .filter(size(col("shingles")) > 0))
    // band join carries ONLY (band, bucket, id): the wide shingle arrays
    // never enter the shuffle; candidates dedup on the narrow pair
    val banded = base
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .select(col("id"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("b.band"), col("b.bucket"))
    val a = banded.alias("a"); val b = banded.alias("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verify: re-attach the shingle sets for the surviving few pairs
    val out = pairs
      .join(base.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      // shingle arrays are SORTED (the kernel builds a SortedSet) — the
      // native unboxed merge scan replaces a per-pair boxed hash set
      // (same expression the jaccard-pairs path uses)
      .withColumn("__inter",
        graft.functions.NativeExpressions.sortedIntersectCount(
          col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jaccard", round(
        col("__inter") / (size(col("sh_a")) + size(col("sh_b")) - col("__inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    out
  }

  /** Full near-dup dedup: LSH pairs → connected components → keep min id
    * per cluster — or, with `keepScore`, the max-score row per cluster
    * (ties → min id), the same quality-aware survivor rule as
    * [[dedupKeepBest]] lifted to NEAR-dup clusters. Signature knobs
    * pass through to [[minhashNearDups]] so callers composing this with
    * the incremental family can hold ONE similarity criterion. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, keepScore: Option[String] = None,
      shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val pairs = minhashNearDups(df, idCol, textCol,
      shingleSize = shingleSize, numHashes = numHashes, bands = bands,
      threshold = threshold)
    keepScore match {
      case None => keepMinPerCluster(df, idCol, pairs)
      case Some(s) => keepBestPerCluster(df, idCol, pairs, s)
    }
  }

  /** Incremental NEAR-dup verdicts — [[incrementalDedup]]'s sibling for
    * the case exact keys cannot catch: does an already-near-deduped
    * corpus contain a near-duplicate (word-shingle Jaccard ≥
    * `threshold`) of each new-batch doc? One row per batch doc:
    * (id, n_corpus_dups, max_jaccard, kept) with kept = no verified
    * corpus match; batch rows yielding no shingles (NULL/blank text)
    * are kept with n_corpus_dups = 0 and NULL max_jaccard (unknown ≠
    * dirty, the family contract). Candidates come from the
    * [[minhashNearDups]] LSH band join run ACROSS the two frames, and
    * every candidate is verified with true Jaccard on the exact shingle
    * sets — the bands only bound the comparison set, they never decide.
    *
    * Scale shape (corpus = the 100-TB side, batch = the increment):
    * - `bloomFpp = None`: the corpus contributes one narrow
    *   (band, bucket, id) exchange (24 B a row, the minhashNearDups
    *   discipline — shingle arrays never enter the candidate shuffle);
    *   colliding corpus ids — dup-volume-sized by construction — are
    *   then persisted, counted, and broadcast when small (the q68
    *   count-gated pattern: a blindly-planned SMJ would have written
    *   the corpus-side exchange before AQE could flip it), so the
    *   second corpus pass fetches verify-side shingles map-side.
    * - `bloomFpp = Some(p)`: a Bloom filter over the BATCH's band
    *   buckets broadcasts (sized by one bounded count over the batch —
    *   the small side by the incremental premise), corpus band rows
    *   that miss it drop MAP-SIDE carrying their shingles with them, so
    *   the corpus is scanned ONCE and its only exchange is true bucket
    *   collisions plus an fpp trickle the exact band equality then
    *   discards. Output is IDENTICAL (no false negatives; the verify
    *   join decides) — the q53/q68 two-plans-one-contract shape.
    *
    * Appending `kept` rows (after a within-batch [[minhashDedup]])
    * preserves the corpus's near-dup invariant at LSH recall, so each
    * increment costs only the increment — never a corpus re-pairing. */
  /** Shingle frame shared by the incremental near-dup family: one row
    * per input row, (out, sh) with sh the sorted hashed shingle set. */
  private def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, out: String): DataFrame = df.select(
    col(idCol).as(out),
    shingleHashUdf(Tools.tokenize(Tools.normalize(col(textCol))),
      lit(shingleSize)).as("sh"))

  /** The sorted hashed word-k-shingle set of a raw text Column — the
    * row-local kernel behind the whole minhash family, exposed for the
    * streaming ingest gate (EventStream.nearDupFlagsStream), which must
    * sign rows with EXACTLY the batch family's arithmetic or its flags
    * would silently diverge from the index. */
  private[graft] def shingleHash(text: Column, shingleSize: Int): Column =
    shingleHashUdf(Tools.tokenize(Tools.normalize(text)), lit(shingleSize))

  /** Band rows of a shingle frame: (id[, sh], band, bucket) — one row
    * per (doc, band). keepSh trades exchange width for a single scan
    * (the bloom path); the narrow variant is the candidate-join side. */
  private def bandFrame(base: DataFrame, id: String, numHashes: Int,
      bands: Int, keepSh: Boolean): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = base.withColumn("sig", minhashSignature(col("sh"), numHashes))
    val cols = (if (keepSh) Seq(col(id), col("sh")) else Seq(col(id))) :+
      explode(lshBands(col("sig"), bands, rowsPerBand)).as("b")
    sig.select(cols: _*)
      .select((if (keepSh) Seq(col(id), col("sh")) else Seq(col(id))) ++
        Seq(col("b.band"), col("b.bucket")): _*)
  }

  /** Verdict assembly shared by the direct and indexed incremental
    * near-dup paths: collapse multi-band candidate rows to pairs,
    * re-attach the batch shingles, exact-verify Jaccard, roll up per
    * batch doc, and left-join back onto EVERY batch id (shingle-less
    * rows kept with zero dups and NULL score). `cand` carries
    * (__bid, __cid, sh) with sh the CORPUS side's shingles. */
  private def nearDupVerdicts(batch: DataFrame, bBase: DataFrame,
      cand: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val verified = cand
      .groupBy(col("__bid"), col("__cid"))
      .agg(first(col("sh")).as("sh_c"))
      .join(bBase.select(col("__bid"), col("sh").as("sh_b")), "__bid")
      .withColumn("__inter",
        graft.functions.NativeExpressions.sortedIntersectCount(
          col("sh_b"), col("sh_c")).cast("double"))
      .withColumn("jaccard", round(
        col("__inter") / (size(col("sh_b")) + size(col("sh_c")) - col("__inter")), 4))
      .filter(col("jaccard") >= threshold)
    val hits = verified.groupBy(col("__bid"))
      .agg(count(lit(1)).as("n_corpus_dups"), max(col("jaccard")).as("max_jaccard"))
    batch.select(col(idCol)).distinct()
      .join(hits, col(idCol) === col("__bid"), "left")
      .select(col(idCol),
        coalesce(col("n_corpus_dups"), lit(0L)).as("n_corpus_dups"),
        col("max_jaccard"))
      .withColumn("kept", col("n_corpus_dups") === 0)
  }

  def incrementalNearDups(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.6,
      bloomFpp: Option[Double] = None): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands must divide numHashes (got bands=$bands, numHashes=$numHashes)")
    def shingled(df: DataFrame, out: String) =
      shingleFrame(df, idCol, textCol, shingleSize, out)
    def withBands(base: DataFrame, id: String, keepSh: Boolean) =
      bandFrame(base, id, numHashes, bands, keepSh)
    // batch is the small side by premise: cache it once — it feeds the
    // band explode, the (bloom path's) filter build, and the verify
    // join. Registered with AutoUnpersist only at the END (the q68
    // ordering generalized): the bloom branch's sizing count and filter
    // build are actions whose plans expose this entry directly
    // (bBuckets is an unpersisted projection over it), so an early
    // registration would release the cache there and every later pass
    // would re-shingle the batch from scratch.
    // rebalance the batch BEFORE the signing kernel (r16): the batch
    // usually arrives as one small file / micro-batch = one partition,
    // so the shingle + 64-hash minhash kernel (the q26 rebalance class)
    // runs on one core without it; no-op on already-parallel batches
    val bBase = shingled(graft.operators.Ops.rebalance(batch), "__bid")
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bBands = withBands(bBase, "__bid", keepSh = false)
    // candidate (batch, corpus, corpus-shingles) triples, one per
    // band-colliding pair — the physical strategy differs per path but
    // the set is identical up to bloom false positives, which the exact
    // (band, bucket) join below discards
    // the corpus side pays the same signing kernel — spread it too
    // (no-op on real multi-file corpora, the Ops.rebalance contract)
    val corpusR = graft.operators.Ops.rebalance(corpus)
    val cand = bloomFpp match {
      case None =>
        // narrow corpus band exchange, then a count-gated fetch of the
        // few colliding docs' shingles (second corpus scan, map-side
        // semi when the hit set broadcasts)
        val cBands = withBands(shingled(corpusR, "__cid")
          .filter(size(col("sh")) > 0), "__cid", keepSh = false)
        val hitP = cBands
          .join(bBands.select("band", "bucket").distinct(),
            Seq("band", "bucket"), "left_semi")
          .select("__cid").distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nHits = hitP.count()
        val hitIds0 = graft.engine.AutoUnpersist.cache(hitP,
          drainFirst = true)
        val hitIds = if (nHits <= 1000000L) broadcast(hitIds0) else hitIds0
        val cFetch = shingled(corpusR, "__cid")
          .join(hitIds, Seq("__cid"), "left_semi")
        bBands.join(withBands(cFetch, "__cid", keepSh = true),
          Seq("band", "bucket"))
      case Some(fpp) =>
        require(fpp > 0 && fpp < 1, s"bloom fpp must be in (0, 1), got $fpp")
        // bucket longs already encode their band (lshBands seeds the
        // hash with the band index), so the filter keys on the bucket
        // value alone; the join below still matches band exactly
        val bBuckets = bBands.select(col("bucket"))
        val n = bBuckets.count()
        if (n == 0) bBands.limit(0)
          .withColumn("__cid", lit(null).cast("long"))
          .withColumn("sh", lit(null).cast("array<bigint>"))
        else {
          val bf = bBuckets.coalesce(8).stat.bloomFilter("bucket", n, fpp)
          val bcast = batch.sparkSession.sparkContext.broadcast(bf)
          val might = udf { (h: Long) => bcast.value.mightContainLong(h) }
          val cHits = withBands(shingled(corpusR, "__cid")
              .filter(size(col("sh")) > 0), "__cid", keepSh = true)
            .filter(might(col("bucket")))
          bBands.join(cHits, Seq("band", "bucket"))
        }
    }
    nearDupVerdicts(batch,
      graft.engine.AutoUnpersist.cache(bBase, drainFirst = true),
      cand, idCol, threshold)
  }

  /** Persisted near-dup BAND INDEX — the production regime for
    * [[incrementalNearDups]] at corpus scale. IncNearBench (SCALE.md)
    * showed the direct operator's scaling term is corpus SIGNING
    * (shingle + minhash compute, re-run on every call), not the
    * exchange — so, exactly like `Ann.writeIvfIndex`, the corpus-side
    * work is computed ONCE into a layout probes reuse: `shingles/`
    * (id, sorted shingle hashes) and `bands/` (id, band, bucket), with
    * a manifest written LAST certifying a complete build and carrying
    * the signature parameters (a probe re-deriving them from its own
    * defaults could silently band-mismatch the index). Appending a
    * kept batch means signing ONLY the batch and appending its rows to
    * both tables — each increment costs the increment. */
  def writeNearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16): Unit = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands must divide numHashes (got bands=$bands, numHashes=$numHashes)")
    // a REBUILD that dies between the table writes must not leave the
    // PREVIOUS build's manifest certifying the new half-written tables
    // (worst case: old band count vs new band tables — every probe
    // silently finds nothing). Retract the certificate first; it is
    // re-issued only after both tables land.
    val mf = nearDupManifestFile(path)
    val fsIdx = mf.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    fsIdx.delete(mf, false)
    // stale tombstones go with the tables: the rebuild's corpus is the
    // caller's authority on membership (compactNearDupIndex's purge
    // point, and the one way to resurrect a taken-down id)
    fsIdx.delete(new org.apache.hadoop.fs.Path(s"$path/deletes"), true)
    // streamed epochs too, and the fresh manifest resets the marks
    // (the appendIvfIndexStream rebuild discipline): stop any live
    // stream first — an in-flight epoch landing after this clear would
    // add docs the rebuild's corpus did not authorize
    fsIdx.delete(new org.apache.hadoop.fs.Path(s"$path/stream_shingles"), true)
    fsIdx.delete(new org.apache.hadoop.fs.Path(s"$path/stream_bands"), true)
    val base = shingleFrame(corpus, idCol, textCol, shingleSize, "__cid")
      .filter(size(col("sh")) > 0)
    base.write.mode("overwrite").parquet(s"$path/shingles")
    // recompute from the written table, not the input: ONE signing pass
    // over the corpus total, and the two tables cannot disagree
    val written = corpus.sparkSession.read.parquet(s"$path/shingles")
    bandFrame(written, "__cid", numHashes, bands, keepSh = false)
      .write.mode("overwrite").parquet(s"$path/bands")
    val rows = written.count()
    writeNearDupManifest(corpus.sparkSession, path,
      shingleSize, numHashes, bands, rows)
  }

  private def nearDupManifestFile(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_MANIFEST.json")

  private def writeNearDupManifest(spark: org.apache.spark.sql.SparkSession,
      path: String, shingleSize: Int, numHashes: Int, bands: Int,
      rows: Long, marks: Map[String, Long] = Map.empty,
      version: Long = 0L,
      dead: Map[String, Seq[String]] = Map.empty): Unit = {
    val p = nearDupManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mark keys sanitized on write (the Ann manifest discipline): the
    // stream tag is an MD5 prefix, but a hand-edited manifest must not
    // smuggle JSON through the parser's regex
    val marksJson = marks.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${k.replaceAll("[^0-9a-zA-Z]", "")}": $v""" }
      .mkString("{", ", ", "}")
    val out = fs.create(p, true)
    try out.write(
      (s"""{"shingle_size": $shingleSize, "num_hashes": $numHashes, """ +
        s""""bands": $bands, "rows": $rows, """ +
        s""""version": $version, """ +
        s""""stream_marks": $marksJson, """ +
        s""""dead_files": ${graft.engine.LayoutFs.deadFilesJson(dead)}, """ +
        s""""built_ms": ${System.currentTimeMillis()}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The manifest's monotonic re-issue counter — the openers' snapshot
    * bracket key ([[graft.engine.LayoutFs.consistentSnapshot]]): every
    * maintenance re-issue (append, fold, purge) bumps it, so a stable
    * version across an opener's listing proves no swap interleaved.
    * Pre-versioning manifests read as 0 (the first maintenance write
    * moves them to 1). None when the manifest is absent. */
  private[graft] def readNearDupVersion(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Option[Long] = {
    val p = nearDupManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(""""version":\s*(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(0L))
    }
  }

  /** The openers' snapshot-bracket key: the version MIXED with the
    * manifest's build stamp — a REBUILD resets the version counter,
    * so version alone could alias across one (ABA); the stamp breaks
    * the tie. */
  private[graft] def readNearDupSnapshotKey(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Option[Long] = {
    val p = nearDupManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def f(k: String): Long =
        (s""""$k":\\s*(\\d+)""").r.findFirstMatchIn(txt)
          .map(_.group(1).toLong).getOrElse(0L)
      Some(f("version") * 0x9E3779B97F4A7CL + f("built_ms"))
    }
  }

  /** The manifest's dead-file grace list per table (a purge's
    * replaced files, retained on disk one maintenance cycle for
    * in-flight readers — [[compactNearDupIndex]]): openers exclude
    * them from the listing, the next maintenance entry collects them
    * physically. Empty for pre-grace manifests or mid-grace absence. */
  private[graft] def readNearDupDead(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Map[String, Seq[String]] = {
    val p = nearDupManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    graft.engine.LayoutFs.parseDeadFiles(txt)
  }

  /** The compaction watermarks from the band-index manifest: max
    * FOLDED epoch per stream tag ([[graft.sim.Ann.IvfManifest]]'s
    * `streamMarks` twin). Pre-streaming manifests (no key) read as
    * empty. */
  private[graft] def readNearDupMarks(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Map[String, Long] = {
    val p = nearDupManifestFile(path)
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

  /** [[readNearDupManifest]] with a SHORT bounded retry on absence
    * (the [[graft.sim.Ann.readManifestPatient]] discipline): a
    * compaction retracts the certificate for its narrow swap windows,
    * and a live probe or stream batch landing inside one must ride it
    * out — while a PERMANENT absence still fails after ~1 s. */
  private[graft] def readNearDupManifestPatient(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Option[(Int, Int, Int, Long)] =
    graft.engine.LayoutFs.patiently(readNearDupManifest(spark, path))

  /** [[readNearDupMarks]] riding out a retraction window the same way:
    * an ABSENT manifest must not read as "no marks" — that is exactly
    * the state mid-swap, and treating it as empty would let a probe
    * double-count a just-folded epoch or a replay rewrite one. Returns
    * empty only when the manifest is PERMANENTLY absent (the caller's
    * own manifest read then refuses loudly). */
  private[graft] def readNearDupMarksPatient(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Map[String, Long] =
    graft.engine.LayoutFs.patiently {
      val p = nearDupManifestFile(path)
      if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(p)) None
      else Some(readNearDupMarks(spark, path))
    }.getOrElse(Map.empty)

  private[graft] def readNearDupManifest(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : Option[(Int, Int, Int, Long)] = {
    val p = nearDupManifestFile(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def f(k: String): Option[Long] =
      (s""""$k":\\s*(-?\\d+)""").r.findFirstMatchIn(txt).map(_.group(1).toLong)
    for (s <- f("shingle_size"); h <- f("num_hashes"); b <- f("bands");
         r <- f("rows"))
      yield (s.toInt, h.toInt, b.toInt, r)
  }

  /** DELETE for the band index — the takedown verb
    * ([[graft.sim.Ann.deleteFromIvfIndex]]'s sibling, r13 verdict #2):
    * tombstoned corpus ids append to a tiny `deletes/` table and every
    * [[incrementalNearDupsIndexed]] probe anti-joins it broadcast, so
    * a removed document stops vetoing new near-duplicates immediately,
    * without re-signing the corpus. Physical purge happens at the next
    * [[compactNearDupIndex]] (or a full rebuild — writeNearDupIndex
    * clears deletes/ with the tables it rewrites). Idempotent; unknown
    * ids are legal. Terminality is scoped to the PRE-PURGE window
    * (r14 advice): while its tombstone stands, a re-appended id stays
    * suppressed probe-side and the next purge removes the re-added
    * rows too — but a purge CONSUMES tombstones that matched nothing
    * still live, after which a plain re-append resurrects the id (and
    * a rebuild always does: the new corpus is the caller's authority
    * on membership). Callers needing a permanent ban keep their own
    * denylist and filter at ingest. */
  def deleteFromNearDupIndex(ids: DataFrame, idCol: String,
      path: String): Unit = {
    val spark = ids.sparkSession
    readNearDupManifest(spark, path).getOrElse(sys.error(
      s"deleteFromNearDupIndex: no near-dup index manifest at $path " +
        "(incomplete build? rebuild with writeNearDupIndex)"))
    val idType = spark.read.parquet(s"$path/bands").schema("__cid").dataType
    ids.select(col(idCol).cast(idType).as("__cid"))
      .filter(col("__cid").isNotNull).distinct()
      .coalesce(1)
      .write.mode("append").parquet(s"$path/deletes")
  }

  /** APPEND for the band index — extend, never re-sign
    * ([[graft.sim.Ann.appendIvfIndex]]'s sibling): the batch is signed
    * under the MANIFEST's stored (shingle_size, num_hashes, bands) —
    * never caller defaults, the same stored-geometry discipline as the
    * ANN append — and its rows append to both tables, so each
    * increment costs the increment while a 100-TB corpus is never
    * re-signed. The signing pass runs ONCE (the batch frame is
    * persisted across the two table writes; shingle/minhash derivation
    * is deterministic, so an evicted partition recomputes identically
    * and the tables cannot disagree). Row accounting is incremental:
    * new total = certified + batch (an O(batch) count, no re-list of
    * the table footers).
    *
    * Torn-append discipline, STAGED (r14 advice): the batch's shingle
    * and band files write to side dirs first — the long, O(batch)
    * part, with the certificate intact so concurrent probes and
    * stream micro-batches never block on it — then the manifest is
    * retracted only for the fast file moves and re-issued after (the
    * fold's stage-before-retract shape). A crash mid-move leaves no
    * certificate and every probe fails loudly instead of silently
    * missing the batch's bands. Duplicate ids are
    * the CALLER's contract (append kept rows — run the incremental
    * dedup gate first, the q107 discipline); an append never dedups.
    * Single-maintenance-writer: refuses while a fold's `_COMPACTING`
    * marker exists and holds `_APPENDING` for its run, which
    * [[compactNearDupIndex]] refuses on — interleaved, the fold's file
    * swap could delete freshly appended rows. */
  def appendToNearDupIndex(batch: DataFrame, idCol: String,
      textCol: String, path: String): Unit = {
    val spark = batch.sparkSession
    val (shingleSize, numHashes, bands, rows) =
      readNearDupManifest(spark, path).getOrElse(sys.error(
        s"appendToNearDupIndex: no near-dup index manifest at $path — " +
          "appends extend a COMPLETE index (build with " +
          "writeNearDupIndex first)"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val compactingP = new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")
    val appendingP = new org.apache.hadoop.fs.Path(s"$path/_APPENDING")
    graft.engine.LayoutFs.acquireMarker(fs, appendingP, compactingP,
      refuseOpposite =
        s"appendToNearDupIndex: a compaction is rewriting table files " +
          s"at '$path' (${compactingP.getName} exists) — rows appended " +
          "now could be deleted by its swap (single-maintenance-writer " +
          "contract); wait for the fold to finish, or delete the marker " +
          "if it crashed mid-run",
      refuseOwn =
        s"appendToNearDupIndex: another append is already running at " +
          s"'$path' (${appendingP.getName} exists) — wait for it to " +
          "finish, or delete the marker if it crashed mid-run")
    try {
      val base = shingleFrame(batch, idCol, textCol, shingleSize, "__cid")
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = base.count()
        if (n > 0) {
          // STAGE both tables' files first (the long signing part,
          // certificate intact — probes and stream batches keep
          // reading); retract the manifest only for the renames below
          val stagedSh =
            new org.apache.hadoop.fs.Path(s"$path/shingles_append")
          val stagedBd =
            new org.apache.hadoop.fs.Path(s"$path/bands_append")
          fs.delete(stagedSh, true) // a crashed previous append's
          fs.delete(stagedBd, true) // leftovers
          base.write.mode("overwrite").parquet(stagedSh.toString)
          bandFrame(base, "__cid", numHashes, bands, keepSh = false)
            .write.mode("overwrite").parquet(stagedBd.toString)
          val marks = readNearDupMarks(spark, path)
          // carried through, not collected: dead-file grace collection
          // is the COMPACT entry's job (one verb owns the deletes);
          // an append mid-grace must keep excluding the purge's
          // replaced files. Version bumps on every re-issue — the
          // openers' snapshot bracket key.
          val dead = readNearDupDead(spark, path)
          val ver = readNearDupVersion(spark, path).getOrElse(0L) + 1
          // fresh total under the marker (the pre-acquire read could
          // predate a maintenance run that finished since)
          val rowsNow = readNearDupManifest(spark, path)
            .map(_._4).getOrElse(rows)
          fs.delete(nearDupManifestFile(path), false)
          Seq(("shingles", stagedSh), ("bands", stagedBd)).foreach {
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
          writeNearDupManifest(spark, path,
            shingleSize, numHashes, bands, rowsNow + n, marks,
            version = ver, dead = dead)
        }
      } finally { base.unpersist(); () }
    } finally { fs.delete(appendingP, false); () }
  }

  /** The streamed epoch partition dirs under `path/stream_<table>`:
    * (streamTag, epoch, dir) triples — the SNAPSHOT unit the fold
    * consumes ([[graft.sim.Ann]]'s listStreamEpochs twin; this layout
    * was born two-level, so no legacy refusal is needed). A
    * non-alphanumeric tag dir (an out-of-band writer's) refuses
    * LOUDLY: the manifest sanitizes mark keys on write, so such a tag
    * could never match its own watermark — every fold would re-append
    * its rows forever. */
  private def nearDupStreamEpochs(fs: org.apache.hadoop.fs.FileSystem,
      path: String, table: String)
      : Seq[(String, Long, org.apache.hadoop.fs.Path)] = {
    val streamP = new org.apache.hadoop.fs.Path(s"$path/stream_$table")
    if (!fs.exists(streamP)) return Nil
    for {
      sd <- fs.listStatus(streamP).toSeq
      if sd.isDirectory && sd.getPath.getName.startsWith("__stream=")
      tag = sd.getPath.getName.stripPrefix("__stream=")
      _ = require(tag.matches("[0-9a-zA-Z]+"),
        s"stream_$table at '$path' holds a non-alphanumeric stream " +
          s"tag dir '__stream=$tag' — not written by this sink " +
          "(manifest mark keys could never match it); remove it or " +
          "rebuild the index")
      ed <- fs.listStatus(sd.getPath).toSeq
      if ed.isDirectory && ed.getPath.getName.startsWith("__epoch=")
    } yield (tag,
      ed.getPath.getName.stripPrefix("__epoch=").toLong, ed.getPath)
  }

  /** The LIVE (not yet folded, actually data-bearing) epoch dirs of
    * one stream table: marks-filtered and husk-guarded. */
  private def liveNearDupEpochs(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, table: String,
      marks: Map[String, Long])
      : Seq[(String, Long, org.apache.hadoop.fs.Path)] =
    nearDupStreamEpochs(fs, path, table)
      .filter(e => graft.engine.LayoutFs.hasVisibleParquetFile(fs, e._3))
      .filterNot { case (tag, ep, _) => marks.get(tag).exists(ep <= _) }

  /** The one table-open point for the band index's probe readers:
    * main table ∪ live streamed epochs
    * ([[graft.sim.Ann]]'s openIvfIndex discipline) — a probe landing
    * between a stream batch and its fold sees the union, and after
    * the fold the same rows from the main table; the verdicts cannot
    * depend on WHEN the fold ran. `excludeEpoch` carves out one
    * (tag, epoch) partition: the self-growing admit gate probes a
    * batch against everything EXCEPT its own epoch's previous
    * incarnation, so an at-least-once replay recomputes the same
    * verdicts instead of being vetoed by itself.
    *
    * VERSION-STABLE (r15 purge-grace work): the whole open — marks
    * read, dead-file exclusion, main listing, epoch listing, and the
    * optional eager tombstone snapshot — runs inside a
    * [[graft.engine.LayoutFs.consistentSnapshot]] bracket keyed on
    * the manifest's re-issue counter, closing the listing-vs-swap
    * race the per-field patient reads could not (a fold renaming
    * staged files in while this opener lists the directory would
    * hand it old AND new copies of the same rows). A purge's
    * replaced files sit in the manifest's `dead_files` grace list:
    * excluded here, still on disk for readers whose listing predates
    * the purge (their tombstone anti-join keeps them exact), and
    * physically collected one maintenance cycle later.
    *
    * `suppressDeletes` applies the takedown anti-join INSIDE the
    * bracket from an EAGER tombstone snapshot (the ids collect to
    * the driver — the deletes table is declared-small, the same
    * contract as the broadcast it feeds): a purge consuming the
    * tombstone files mid-probe must not fail the probe's lazy read,
    * and a bands listing from before the purge must never pair with
    * an after-the-purge empty tombstone set (purged rows would
    * resurface for exactly that probe). */
  private[graft] def openNearDupTable(
      spark: org.apache.spark.sql.SparkSession, path: String,
      table: String,
      excludeEpoch: Option[(String, Long)] = None,
      suppressDeletes: Boolean = false): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.engine.LayoutFs.consistentSnapshot(
        s"openNearDupTable($table) at '$path'",
        readNearDupSnapshotKey(spark, path)) {
      val deadT = readNearDupDead(spark, path)
        .getOrElse(table, Nil).toSet
      val main =
        if (deadT.isEmpty) spark.read.parquet(s"$path/$table")
        else {
          val livePaths = fs.listStatus(
              new org.apache.hadoop.fs.Path(s"$path/$table")).toSeq
            .filter(st => st.isFile &&
              st.getPath.getName.endsWith(".parquet") &&
              !deadT(st.getPath.getName))
            .map(_.getPath.toString)
          if (livePaths.isEmpty)
            // every file replaced mid-grace: schema from the dir (dead
            // files share it), zero rows
            spark.read.parquet(s"$path/$table").limit(0)
          else spark.read.parquet(livePaths: _*)
        }
      val live = liveNearDupEpochs(spark, fs, path, table,
          readNearDupMarksPatient(spark, path))
        .filterNot { case (tag, ep, _) =>
          excludeEpoch.contains((tag, ep)) }
      val unioned =
        if (live.isEmpty) main
        else {
          val cols = main.columns.toIndexedSeq.map(col)
          main.unionByName(
            spark.read.option("basePath", s"$path/stream_$table")
              .parquet(live.map(_._3.toString): _*)
              .select(cols: _*))
        }
      if (!suppressDeletes) unioned
      else {
        val delP = new org.apache.hadoop.fs.Path(s"$path/deletes")
        if (!graft.engine.LayoutFs.hasVisibleParquetFile(fs, delP))
          unioned
        else {
          val delDf = spark.read.parquet(delP.toString)
            .select(col("__cid")).distinct()
          val ids = delDf.collect().toIndexedSeq
          if (ids.isEmpty) unioned
          else unioned.join(
            broadcast(spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](
                scala.jdk.CollectionConverters.SeqHasAsJava(ids).asJava),
              delDf.schema)),
            Seq("__cid"), "left_anti")
        }
      }
    }
  }

  /** One micro-batch of the band-index STREAM append
    * ([[graft.streaming.EventStream.appendNearDupIndexStream]]'s
    * core; package-visible so the replay spec drives the exact
    * at-least-once cases). The batch signs under the manifest's
    * STORED signature — `pre` is the stream-start (shingleSize,
    * numHashes, bands), re-checked against the current manifest every
    * batch as the mid-stream-rebuild tripwire — and lands in
    * `stream_shingles/` + `stream_bands/` partitioned by
    * (__stream=checkpoint-tag, __epoch): dynamic partition overwrite
    * makes an at-least-once replay rewrite its own epoch rather than
    * duplicate it, a FOLDED epoch's replay is skipped against the
    * manifest's stream_marks (and taken back by the post-write
    * re-verify if a fold won the race — the appendIvfBatch discipline,
    * both sides), and the data files carry exactly the main tables'
    * schema so the fold is a plain append-and-delete. The manifest
    * stays untouched (rows accounting happens at the fold); duplicate
    * ids across epochs are the caller's contract — dedup at ingest
    * first, or use the admit gate. */
  private[graft] def appendNearDupStreamBatch(batch: DataFrame,
      path: String, idCol: String, textCol: String, tag: String,
      epoch: Long, pre: (Int, Int, Int)): Unit = {
    require(tag.matches("[0-9a-zA-Z]+"),
      s"appendNearDupStreamBatch: stream tag '$tag' must be " +
        "alphanumeric (manifest mark keys are)")
    val spark = batch.sparkSession
    val (ss, nh, nb, _) =
      readNearDupManifestPatient(spark, path).getOrElse(sys.error(
        s"appendNearDupIndexStream: the manifest at $path vanished " +
          "mid-stream — index being rebuilt? stop the stream during " +
          "rebuilds (single-writer contract)"))
    require((ss, nh, nb) == pre,
      s"appendNearDupIndexStream: the index at $path was REBUILT " +
        s"mid-stream with a different signature (($ss, $nh, $nb) != " +
        s"stream-start $pre) — rows signed under the old parameters " +
        "must not mix in; restart the stream against the new index")
    if (readNearDupMarksPatient(spark, path).get(tag).exists(epoch <= _))
      return
    if (batch.isEmpty) return
    val base = shingleFrame(batch, idCol, textCol, ss, "__cid")
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (base.count() > 0) {
        def land(df: DataFrame, table: String): Unit =
          df.withColumn("__stream", lit(tag))
            .withColumn("__epoch", lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__stream", "__epoch")
            .parquet(s"$path/stream_$table")
        land(base, "shingles")
        land(bandFrame(base, "__cid", nh, nb, keepSh = false), "bands")
        // post-write re-verify: a fold that banked this epoch's
        // previous dir between our marks read and our writes has its
        // rows in the main tables already — take the re-created dirs
        // back (the fold's resurrected-epoch sweep closes the same
        // race from its side). PATIENT: an absent-mid-swap manifest
        // read as "no marks" would skip the take-back exactly when a
        // fold is running.
        if (readNearDupMarksPatient(spark, path).get(tag)
            .exists(epoch <= _)) {
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          Seq("shingles", "bands").foreach { t =>
            fs.delete(new org.apache.hadoop.fs.Path(
              s"$path/stream_$t/__stream=$tag/__epoch=$epoch"), true)
          }
        }
      }
    } finally { base.unpersist(); () }
  }

  /** COMPACT for the band index — the stream fold AND the physical
    * tombstone purge ([[graft.sim.Ann.compactIvfIndex]]'s sibling).
    * Streamed epochs ([[appendNearDupStreamBatch]]) fold FIRST: their
    * data files carry exactly the main tables' schema, so the fold
    * appends them — O(streamed rows), the main tables' existing files
    * untouched — recording each tag's max folded epoch in the
    * manifest's `stream_marks` (replay watermark). The folded epoch
    * dirs are RETAINED under that watermark for one fold cycle (r15
    * probe grace, the live-race soak): probes in flight across the
    * fold finish against intact files, post-mark probes skip them,
    * and the next fold's entry collection deletes them.
    * The purge is then FILE-scoped the way the ANN fold is
    * cell-scoped: the tables are flat (no partition key), so it
    * locates the files actually holding a tombstoned row (one
    * id-column-only scan over `_metadata.file_path`), rewrites ONLY
    * those files' survivors, and swaps them in — untouched files are
    * never read again nor rewritten, so a bounded takedown against a
    * 100-TB index costs O(touched files), not O(index). Tombstone
    * files and epoch dirs are snapshotted at entry (the ANN
    * discipline): a delete or epoch landing mid-fold survives to the
    * next one, still suppressed/visible probe-side meanwhile
    * ([[openNearDupTable]] unions live epochs).
    *
    * Crash-safety is the certificate, not atomic renames: the
    * manifest is retracted for the swap window (stage survivors →
    * move staged files in → delete doomed files → consume tombstones
    * → re-issue manifest with the purged count), so a crash mid-swap
    * leaves a loudly-unprobable index, never a silent double-count or
    * resurrection. Refuses while `_APPENDING` exists and holds
    * `_COMPACTING` (single-maintenance-writer, both ways). No-op when
    * no tombstones exist.
    *
    * Returns the count of tombstone-matched DOCS physically purged —
    * 0 for a fold-only run — so compliance receipts (the YAML
    * takedown/compact surface) can record the purge; the count rides
    * the purge's existing shingles-side job, no extra scan. */
  def compactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delDir = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val delFiles: Seq[org.apache.hadoop.fs.Path] =
      if (!fs.exists(delDir)) Nil
      else fs.listStatus(delDir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    val marks0 = readNearDupMarksPatient(spark, path)
    // GRACE COLLECTION (r15, the live-race soak): epoch dirs a
    // PREVIOUS fold banked were retained under the watermark so
    // probes in flight across that fold could finish their reads
    // (marks make them invisible to every later probe). A full fold
    // cycle later, collect them — this also sweeps replay-resurrected
    // dirs the sink's own post-write re-verify lost the race on.
    Seq("shingles", "bands").foreach { t =>
      nearDupStreamEpochs(fs, path, t).foreach { case (tg, ep, d) =>
        if (marks0.get(tg).exists(ep <= _)) { fs.delete(d, true); () }
      }
    }
    sweepStreamHusks(fs, path)
    val epochsSh = liveNearDupEpochs(spark, fs, path, "shingles", marks0)
    val epochsBd = liveNearDupEpochs(spark, fs, path, "bands", marks0)
    if (delFiles.isEmpty && epochsSh.isEmpty && epochsBd.isEmpty) {
      // nothing to fold or purge — still a maintenance ENTRY, so a
      // previous purge's dead-file grace list is collected here too
      // (marker-guarded; silently deferred if a writer holds the
      // index — the next entry gets it)
      collectNearDupDeadStandalone(spark, fs, path)
      sweepDeletesDir(fs, delDir)
      sweepStreamHusks(fs, path)
      return 0L
    }
    val (shingleSize, numHashes, bands, rows0) =
      readNearDupManifest(spark, path).getOrElse(sys.error(
        s"compactNearDupIndex: no near-dup index manifest at $path — " +
          "nothing certified to compact; rebuild with writeNearDupIndex"))
    val appendingP = new org.apache.hadoop.fs.Path(s"$path/_APPENDING")
    val compactingP = new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")
    graft.engine.LayoutFs.acquireMarker(fs, compactingP, appendingP,
      refuseOpposite =
        s"compactNearDupIndex: a batch append is running at '$path' " +
          s"(${appendingP.getName} exists) — its freshly appended files " +
          "could be deleted by this fold's swap (single-maintenance-" +
          "writer contract); wait for the append to finish, or delete " +
          "the marker if it crashed mid-run",
      refuseOwn =
        s"compactNearDupIndex: another compaction is already running " +
          s"at '$path' (${compactingP.getName} exists) — wait for it " +
          "to finish, or delete the marker if it crashed mid-run")
    try {
      // DEAD-FILE GRACE COLLECTION (r15): a previous purge's replaced
      // files were kept on disk for readers whose listing predated it
      // (openNearDupTable excludes them via the manifest's dead list);
      // one maintenance cycle later — here, under the marker — they
      // are physically collected. Idempotent: a missing name is a
      // no-op delete.
      readNearDupDead(spark, path).foreach { case (table, names) =>
        names.foreach { n =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/$table/$n"),
            false)
        }
      }
      // fresh accounting under the marker: the pre-acquire read's
      // totals could predate an append that finished between the
      // read and the acquisition
      val (_, _, _, rowsFresh) =
        readNearDupManifest(spark, path).getOrElse(
          (shingleSize, numHashes, bands, rows0))
      var ver = readNearDupVersion(spark, path).getOrElse(0L)
      var rows = rowsFresh
      var marks = marks0
      // STEP 1 — fold the streamed epoch SNAPSHOT into the main
      // tables: the stream data files carry exactly the main schema
      // (__stream/__epoch are directory-encoded), so the fold stages
      // the rows (the long part, certificate intact — the ANN
      // stage-before-retract discipline), then renames the staged
      // files in, deletes the epoch dirs, and re-issues the manifest
      // with the watermarks — the retraction window covers only fast
      // file moves, which the patient readers ride out. O(streamed
      // rows); the main tables' existing files are never read nor
      // rewritten.
      //
      // Only epochs data-bearing in BOTH tables fold: a shingles-only
      // or bands-only epoch is a crash remnant torn between the
      // sink's two writes (necessarily its tag's NEWEST epoch — the
      // crashed batch committed no offset, so no later epoch exists),
      // and folding the half that landed while marking the epoch
      // would permanently block the restarted stream's healing
      // replay. Torn epochs are left untouched below the mark: the
      // replay overwrites both dirs and the next fold takes them;
      // meanwhile they are probe-invisible (verdicts need both
      // tables). They are also never DELETED here — the "torn" dir
      // may be a LIVE batch mid-write between its two table writes.
      val completeEpochs = {
        val bdSet = epochsBd.map(e => (e._1, e._2)).toSet
        epochsSh.filter(e => bdSet((e._1, e._2)))
      }
      if (completeEpochs.nonEmpty) {
        val keys = completeEpochs.map(e => (e._1, e._2)).toSet
        def staged(table: String,
            eps: Seq[(String, Long, org.apache.hadoop.fs.Path)])
            : org.apache.hadoop.fs.Path = {
          val stagedP =
            new org.apache.hadoop.fs.Path(s"$path/${table}_fold")
          fs.delete(stagedP, true) // a crashed previous fold's leftover
          val cols = spark.read.parquet(s"$path/$table")
            .columns.toIndexedSeq.map(col)
          spark.read.option("basePath", s"$path/stream_$table")
            .parquet(eps.map(_._3.toString): _*).select(cols: _*)
            .write.mode("overwrite").parquet(stagedP.toString)
          stagedP
        }
        val epochsBdC = epochsBd.filter(e => keys((e._1, e._2)))
        val stagedSh = staged("shingles", completeEpochs)
        val stagedBd = staged("bands", epochsBdC)
        // accounting from the staged footprint — no second full scan
        // of the stream files, and it counts exactly what swaps in
        val folded = spark.read.parquet(stagedSh.toString).count()
        fs.delete(nearDupManifestFile(path), false)
        Seq(("shingles", stagedSh), ("bands", stagedBd)).foreach {
          case (table, stagedP) =>
            fs.listStatus(stagedP).toSeq
              .filter(st =>
                st.isFile && st.getPath.getName.endsWith(".parquet"))
              .foreach { st =>
                fs.rename(st.getPath,
                  new org.apache.hadoop.fs.Path(
                    s"$path/$table/${st.getPath.getName}"))
              }
            fs.delete(stagedP, true)
        }
        // the folded epoch dirs are RETAINED under the watermark
        // written below (r15 grace, the live-race soak): no file a
        // pre-fold probe listed is ever deleted by this fold — the
        // main tables only GAIN files, the marks make the folded
        // epochs invisible to every post-mark probe, and the next
        // fold's entry-time grace collection removes the dirs. (The
        // replay-resurrection race the old same-fold sweep closed is
        // still covered: the sink's post-write re-verify deletes its
        // own epoch when a mark overtook it, and the entry collection
        // catches the residue one cycle later.)
        sweepStreamHusks(fs, path)
        rows += folded
        marks = marks ++ completeEpochs.groupBy(_._1).map {
          case (tag, es) =>
            tag -> math.max(es.map(_._2).max, marks.getOrElse(tag, -1L))
        }
        ver += 1
        writeNearDupManifest(spark, path,
          shingleSize, numHashes, bands, rows, marks, version = ver)
      }
      // STEP 2 — the file-scoped tombstone purge, now covering the
      // freshly folded rows too (the doomed-file scan runs on the
      // post-fold tables)
      if (delFiles.nonEmpty) {
        val dels = spark.read.parquet(delFiles.map(_.toString): _*)
          .select(col("__cid").as("__del_id")).distinct()
        // the touched file set per table: an id-and-path-only scan
        // (parquet reads just __cid; file_path is scan metadata)
        def doomedFiles(table: String): Seq[String] =
          spark.read.parquet(s"$path/$table")
            .select(col("__cid"), col("_metadata.file_path").as("__f"))
            .join(broadcast(dels), col("__cid") === col("__del_id"),
              "left_semi")
            .select("__f").distinct().collect().map(_.getString(0)).toSeq
        val doomed = Seq("shingles", "bands").map(t => t -> doomedFiles(t))
        if (doomed.forall(_._2.isEmpty)) {
          // tombstones matching nothing in the MAIN tables: consume the
          // snapshot files — except ids still living in a remaining
          // stream epoch (torn, or landed after this fold's snapshot),
          // whose tombstones are retained (r14 advice: consuming them
          // here would let the id resurface once a later fold banks
          // that epoch, with no tombstone left to suppress it)
          retainStreamTombstones(spark, fs, path, dels)
          delFiles.foreach(f => fs.delete(f, false))
          sweepDeletesDir(fs, delDir)
          return 0L
        }
        // stage every touched file's survivors FIRST (the long part);
        // the certificate-retraction window covers only the file moves
        var purgedDocs = 0L
        val staged = doomed.map { case (table, files) =>
          val stagedP =
            new org.apache.hadoop.fs.Path(s"$path/${table}_compact")
          fs.delete(stagedP, true) // a crashed previous fold's leftover
          if (files.nonEmpty) {
            val touched = spark.read.parquet(files: _*)
            if (table == "shingles")
              purgedDocs = touched
                .join(broadcast(dels), col("__cid") === col("__del_id"),
                  "left_semi").count()
            touched.join(broadcast(dels), col("__cid") === col("__del_id"),
                "left_anti")
              .write.mode("overwrite").parquet(stagedP.toString)
          }
          (table, files, stagedP)
        }
        fs.delete(nearDupManifestFile(path), false)
        staged.foreach { case (table, files, stagedP) =>
          if (files.nonEmpty) {
            fs.listStatus(stagedP).toSeq
              .filter(st =>
                st.isFile && st.getPath.getName.endsWith(".parquet"))
              .foreach { st =>
                fs.rename(st.getPath,
                  new org.apache.hadoop.fs.Path(
                    s"$path/$table/${st.getPath.getName}"))
              }
          }
          fs.delete(stagedP, true)
        }
        // the replaced files are NOT deleted — they enter the
        // manifest's dead-file grace list below (r15, the purge-soak
        // finding): a reader whose listing predates this purge
        // finishes against intact files (its eager tombstone snapshot
        // keeps it exact), every later reader excludes them by name,
        // and the NEXT maintenance entry collects them physically —
        // the same one-cycle grace the folded epoch dirs ride.
        val deadNow: Map[String, Seq[String]] = doomed.collect {
          case (table, files) if files.nonEmpty =>
            table -> files.map(f =>
              new org.apache.hadoop.fs.Path(f).getName)
        }.toMap
        // re-issue the certificate FIRST (the retraction window stays
        // file-moves-only), then retain-and-consume the tombstone
        // snapshot: an id still living in a remaining stream epoch
        // (torn between the sink's two table writes, or landed after
        // this fold's snapshot) keeps a tombstone — consuming it would
        // let the id resurface once a later fold banks that epoch (r14
        // advice). A crash between the re-issue and the consumption
        // below just leaves the tombstones standing: still suppressed
        // probe-side, re-purged idempotently by the next fold.
        ver += 1
        writeNearDupManifest(spark, path,
          shingleSize, numHashes, bands, rows - purgedDocs, marks,
          version = ver, dead = deadNow)
        retainStreamTombstones(spark, fs, path, dels)
        delFiles.foreach(f => fs.delete(f, false))
        sweepDeletesDir(fs, delDir)
        purgedDocs
      } else 0L
    } finally { fs.delete(compactingP, false); () }
  }

  /** Dead-file grace collection for a maintenance entry that has no
    * other work ([[compactNearDupIndex]]'s early return): acquires
    * the `_COMPACTING` marker just for the collection (a concurrent
    * writer defers it to the next entry — this is opportunistic
    * hygiene, never worth failing a no-op compact over), deletes the
    * manifest's dead files, and re-issues the certificate with the
    * list cleared so openers stop paying the exclusion listing. */
  private def collectNearDupDeadStandalone(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val dead = readNearDupDead(spark, path)
    if (dead.forall(_._2.isEmpty)) return
    val appendingP = new org.apache.hadoop.fs.Path(s"$path/_APPENDING")
    val compactingP = new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")
    try graft.engine.LayoutFs.acquireMarker(fs, compactingP, appendingP,
      refuseOpposite = "busy", refuseOwn = "busy")
    catch { case _: IllegalArgumentException => return }
    try {
      readNearDupManifest(spark, path).foreach {
        case (ss, nh, nb, rows) =>
          dead.foreach { case (table, names) =>
            names.foreach { n =>
              fs.delete(
                new org.apache.hadoop.fs.Path(s"$path/$table/$n"), false)
            }
          }
          val marks = readNearDupMarks(spark, path)
          val ver = readNearDupVersion(spark, path).getOrElse(0L) + 1
          fs.delete(nearDupManifestFile(path), false)
          writeNearDupManifest(spark, path, ss, nh, nb, rows, marks,
            version = ver)
      }
    } finally { fs.delete(compactingP, false); () }
  }

  /** Re-write (as a fresh tombstone file, BEFORE the snapshot files
    * are consumed — no window of absence) the tombstoned ids that
    * still match a row in a REMAINING stream epoch dir: torn epochs
    * (data-bearing in one table only — probe-invisible, but their
    * healing replay lands both tables and a later fold banks them)
    * and epochs landed after the calling fold's snapshot. Without
    * this, consuming the snapshot would silently break the takedown
    * for exactly those ids (r14 advice). The scan is column-pruned
    * (__cid only) over the stream backlog — bounded by the
    * compaction policy, zero when no epochs remain (the common
    * case: one cheap listing). An epoch landing AFTER this scan and
    * before the caller deletes the snapshot files can still slip
    * through the ms-wide gap — the terminal-takedown contract is
    * pre-purge-scoped for that reason (see
    * [[deleteFromNearDupIndex]]). */
  private def retainStreamTombstones(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      dels: DataFrame): Unit = {
    val stillIds = Seq("shingles", "bands").flatMap { t =>
      val dirs = nearDupStreamEpochs(fs, path, t)
        .filter(e => graft.engine.LayoutFs.hasVisibleParquetFile(fs, e._3))
        .map(_._3.toString)
      if (dirs.isEmpty) None
      else Some(spark.read.option("basePath", s"$path/stream_$t")
        .parquet(dirs: _*).select(col("__cid")))
    }
    if (stillIds.isEmpty) return
    val retained = dels.join(stillIds.reduce(_ union _),
      col("__del_id") === col("__cid"), "left_semi")
    if (!retained.isEmpty)
      retained.select(col("__del_id").as("__cid")).distinct()
        .coalesce(1).write.mode("append").parquet(s"$path/deletes")
  }

  /** Remove empty stream-epoch husk dirs (a fully folded tag's empty
    * `__stream=` dir; a `stream_*` root left with only `_SUCCESS`) —
    * never a dir still holding anything: a live epoch, or one landing
    * mid-sweep, survives. */
  private def sweepStreamHusks(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit =
    Seq("shingles", "bands").foreach { t =>
      val root = new org.apache.hadoop.fs.Path(s"$path/stream_$t")
      if (fs.exists(root)) {
        fs.listStatus(root).toSeq.filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("__stream=")).foreach { sd =>
          if (fs.listStatus(sd.getPath).isEmpty) {
            fs.delete(sd.getPath, true); ()
          }
        }
        if (!fs.listStatus(root).exists(_.isDirectory)) {
          fs.delete(root, true); ()
        }
      }
    }

  /** Remove a deletes/ dir holding no parquet DATA file (a `_SUCCESS`
    * marker alone is a husk) — but never one where a fresh tombstone
    * landed after this fold's snapshot. */
  private def sweepDeletesDir(fs: org.apache.hadoop.fs.FileSystem,
      delDir: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(delDir) && !fs.listStatus(delDir).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))) {
      fs.delete(delDir, true); ()
    }

  /** Auto-purge policy for the band index (the
    * [[graft.sim.Ann.maybeCompactIvfIndex]] discipline at the DELETE
    * boundary): fold when the tombstone backlog crosses a declared
    * threshold — `afterDeletes` (tombstone rows ≥ N, an O(tombstones)
    * count) or `afterDeletesPct` (tombstone rows ≥ X% of the
    * manifest-certified total — no table re-list, the certified count
    * is free). Checked by the YAML `neardup_index` delete mode.
    * `afterEpochs` trips the same fold on the STREAM backlog instead
    * (live epoch dirs ≥ N — a pure directory listing, checked by the
    * streaming sink after each micro-batch lands, the
    * [[graft.sim.Ann.maybeCompactIvfIndex]] epoch rule). Returns true
    * when a fold ran. */
  def maybeCompactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, afterDeletes: Option[Long] = None,
      afterDeletesPct: Option[Double] = None,
      afterEpochs: Option[Int] = None): Boolean = {
    if (afterDeletes.isEmpty && afterDeletesPct.isEmpty &&
      afterEpochs.isEmpty) return false
    afterDeletes.foreach(n => require(n >= 1,
      s"purge_after_deletes must be >= 1, got $n"))
    afterDeletesPct.foreach(p => require(p > 0,
      s"purge_after_deletes_pct must be > 0, got $p"))
    afterEpochs.foreach(n => require(n >= 1,
      s"compact_after_epochs must be >= 1, got $n"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a policy check riding a stream micro-batch or a YAML delete must
    // DEFER under a live maintenance writer, not die: throwing the
    // single-writer refusal inside foreachBatch would kill the
    // streaming query over a fold that can simply run next batch (r14
    // advice). The residual marker-lands-after-this-check race is the
    // acquireMarker refusal — loud, and only reachable from a manual
    // concurrent launch, never from this deferring path.
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/_APPENDING")) ||
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/_COMPACTING")))
      return false
    val epochTrip = afterEpochs.exists { n =>
      val marks = readNearDupMarks(spark, path)
      liveNearDupEpochs(spark, fs, path, "shingles", marks).size >= n
    }
    val delTrip = !epochTrip && {
      val delP = new org.apache.hadoop.fs.Path(s"$path/deletes")
      (afterDeletes.nonEmpty || afterDeletesPct.nonEmpty) &&
      // hasVisibleParquetFile, not exists: a deletes/ dir holding only
      // a crashed write's husks must read as "no backlog", not crash
      // the YAML delete boundary on schema inference (r14 advice — the
      // Ann.maybeCompactIvfIndex rule)
      graft.engine.LayoutFs.hasVisibleParquetFile(fs, delP) && {
        val nDel = spark.read.parquet(delP.toString).count()
        nDel > 0 && (afterDeletes.exists(nDel >= _) ||
          afterDeletesPct.exists { pct =>
            val total =
              readNearDupManifest(spark, path).map(_._4).getOrElse(0L)
            total > 0 && nDel * 100.0 >= pct * total
          })
      }
    }
    val hit = epochTrip || delTrip
    if (hit) compactNearDupIndex(spark, path)
    hit
  }

  /** [[incrementalNearDups]] against a PERSISTED index: verdicts are
    * identical (GraphDedupSpec pins parity), but the corpus side is a
    * narrow parquet read of pre-computed bands plus a count-gated fetch
    * of colliding docs' shingles — per-batch cost independent of corpus
    * size. Signature parameters come FROM the manifest (never from
    * caller defaults — a drifted probe would silently miss every
    * near-dup); a missing manifest fails loudly (incomplete or
    * pre-manifest build). Tombstoned ids ([[deleteFromNearDupIndex]])
    * are filtered at the band scan — sufficient AND cheapest: pairs,
    * hit ids, and the shingle fetch all derive from it, so a deleted
    * doc can never resurface downstream. */
  def incrementalNearDupsIndexed(batch: DataFrame, indexPath: String,
      idCol: String, textCol: String, threshold: Double = 0.6,
      bloomFpp: Option[Double] = None): DataFrame =
    incrementalNearDupsIndexedImpl(batch, indexPath, idCol, textCol,
      threshold, bloomFpp, excludeEpoch = None)

  /** [[incrementalNearDupsIndexed]] with one streamed (tag, epoch)
    * partition carved OUT of the corpus side — the self-growing admit
    * gate ([[graft.streaming.EventStream.nearDupAdmitStream]]) probes
    * each micro-batch against everything except its OWN epoch's
    * previous incarnation, so an at-least-once replay recomputes the
    * same verdicts instead of being vetoed by itself. */
  private[graft] def incrementalNearDupsIndexedImpl(batch: DataFrame,
      indexPath: String, idCol: String, textCol: String,
      threshold: Double, bloomFpp: Option[Double],
      excludeEpoch: Option[(String, Long)]): DataFrame = {
    val spark = batch.sparkSession
    val (shingleSize, numHashes, bands, _) =
      readNearDupManifestPatient(spark, indexPath).getOrElse(sys.error(
        s"no near-dup index manifest at $indexPath (incomplete build? " +
          "rebuild with writeNearDupIndex)"))
    // registered with AutoUnpersist at the END, like the direct path:
    // the bloom branch's count/build actions would release an
    // already-registered entry (bBuckets is an unpersisted projection)
    // rebalance before the signing kernel, as in the direct path (r16)
    val bBase = shingleFrame(graft.operators.Ops.rebalance(batch),
        idCol, textCol, shingleSize, "__bid")
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bBands = bandFrame(bBase, "__bid", numHashes, bands, keepSh = false)
    // each open is version-stable internally (openNearDupTable's
    // snapshot bracket); cross-table consistency needs no shared
    // snapshot because every maintenance verb preserves LOGICAL
    // content (a fold moves rows main-ward, a purge erases rows the
    // tombstone anti-join already suppressed), so a shingles open at
    // version v and a bands open at v+1 read the same document set.
    // Tombstone suppression on the BAND scan is sufficient AND rides
    // inside the bands open's own bracket: pairs, hit ids, and the
    // shingle fetch all derive from it
    val cBands0 = openNearDupTable(spark, indexPath, "bands",
      excludeEpoch, suppressDeletes = true)
    val cBands = bloomFpp match {
      case None => cBands0
      case Some(fpp) =>
        require(fpp > 0 && fpp < 1, s"bloom fpp must be in (0, 1), got $fpp")
        val bBuckets = bBands.select(col("bucket"))
        val n = bBuckets.count()
        if (n == 0) cBands0.limit(0)
        else {
          val bf = bBuckets.coalesce(8).stat.bloomFilter("bucket", n, fpp)
          val bcast = spark.sparkContext.broadcast(bf)
          val might = udf { (h: Long) => bcast.value.mightContainLong(h) }
          cBands0.filter(might(col("bucket")))
        }
    }
    // the pair set feeds BOTH the hit-id derivation and the candidate
    // join — without a cache the corpus band scan + join runs twice.
    // persist FIRST, count SECOND, register with AutoUnpersist LAST
    // (the q68 ordering: the count is itself an action and would
    // release an already-registered cache before the verdict join)
    val pairsP = bBands.join(cBands, Seq("band", "bucket"))
      .select(col("__bid"), col("__cid")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // colliding corpus docs' shingles fetch map-side when the hit set
    // broadcasts (the count-gated pattern — collisions are dup-volume-
    // sized by construction)
    val hitP = pairsP.select("__cid").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHits = hitP.count()
    val pairs = graft.engine.AutoUnpersist.cache(pairsP, drainFirst = true)
    val hitIds0 = graft.engine.AutoUnpersist.cache(hitP, drainFirst = true)
    val hitIds = if (nHits <= 1000000L) broadcast(hitIds0) else hitIds0
    val cShingles = openNearDupTable(spark, indexPath, "shingles",
        excludeEpoch)
      .join(hitIds, Seq("__cid"), "left_semi")
    val cand = pairs.join(cShingles, "__cid")
    nearDupVerdicts(batch,
      graft.engine.AutoUnpersist.cache(bBase, drainFirst = true),
      cand, idCol, threshold)
  }

  /** Drop-variant of [[incrementalNearDups]]: the batch rows safe to
    * append to the corpus — no verified corpus near-dup, then
    * [[minhashDedup]] WITHIN the survivors (two batch copies of one new
    * doc must not both survive; corpus rows are never touched). The
    * signature parameters govern BOTH passes — one similarity
    * criterion, vs-corpus and within-batch alike. */
  def incrementalNearDedup(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.6,
      bloomFpp: Option[Double] = None): DataFrame = {
    val verdicts = incrementalNearDups(batch, corpus, idCol, textCol,
      shingleSize, numHashes, bands, threshold, bloomFpp)
    val novel = batch.join(
      verdicts.filter(!col("kept")).select(col(idCol)), Seq(idCol), "left_anti")
    minhashDedup(novel, idCol, textCol, threshold,
      shingleSize = shingleSize, numHashes = numHashes, bands = bands)
  }

  /** Cross-source duplicate-overlap matrix — the "how much of source A
    * is already in source B" audit that decides which corpus to dedup
    * against which (C4-vs-CommonCrawl-style containment questions). One
    * row per co-occurring ordered source pair:
    * (source_a, source_b, n_shared, n_a, n_b, overlap_bp) where
    * n_shared counts DISTINCT content keys (exact md5 or normalized
    * fingerprint per `method`) present in both sources, n_a/n_b the
    * sources' distinct-key totals, and overlap_bp =
    * n_shared·10⁴ div min(n_a, n_b) — containment of the smaller side,
    * exact integer basis points (the skewStats arithmetic). Pairs
    * sharing nothing are absent. A NULL source is its own group
    * (ordered first — the domainStats never-silently-drop contract);
    * NULL-text rows yield no key and sit out.
    *
    * Scale shape: ONE distinct exchange builds the (source, key) table
    * (map-side combined, 32 B keys); the matrix self-join re-shuffles
    * that table — cached across its two sides and the totals pass —
    * on the key, where a key shared by s sources fans out to at most
    * s²/2 pairs. The output and the per-key fan-out are both bounded by
    * the SOURCE cardinality squared: this operator is for declared-few
    * sources (crawl snapshots, dataset names — tens to hundreds); for
    * high-cardinality keys (per-domain) use `domainStats` + joins
    * instead. Totals ride one small broadcast. */
  def sourceOverlap(df: DataFrame, sourceCol: String, textCol: String,
      method: String = "exact"): DataFrame = {
    val keyOf: Column => Column = method match {
      case "exact"       => c => md5(c.cast("binary"))
      case "fingerprint" => c => fingerprint(c)
      case other => sys.error(
        s"sourceOverlap: unknown method '$other' (exact | fingerprint)")
    }
    val keys = graft.engine.AutoUnpersist.cache(
      df.select(col(sourceCol).as("source"), keyOf(col(textCol)).as("__k"))
        .filter(col("__k").isNotNull).distinct())
    val totals = broadcast(
      keys.groupBy(col("source")).agg(count(lit(1)).as("n")))
    val a = keys.alias("a"); val b = keys.alias("b")
    // NULL sorts first so the NULL group pairs deterministically (a
    // plain < would silently drop every pair touching it)
    val ordered = (col("a.source").isNull && col("b.source").isNotNull) ||
      (col("a.source") < col("b.source"))
    a.join(b, col("a.__k") === col("b.__k") && ordered)
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared")) // keys pre-distinct per source
      .join(totals.select(col("source").as("__sa"), col("n").as("n_a")),
        col("source_a") <=> col("__sa"), "left")
      .join(totals.select(col("source").as("__sb"), col("n").as("n_b")),
        col("source_b") === col("__sb"), "left")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        expr("(n_shared * 10000L) div least(n_a, n_b)").as("overlap_bp"))
  }

  /** NEAR-dup cross-source overlap — [[sourceOverlap]]'s sibling for
    * the duplication exact keys cannot see (the real C4-vs-CommonCrawl
    * audit: how much of source A already exists in source B as a NEAR
    * duplicate). One row per ordered co-occurring source pair:
    * (source_a, source_b, n_docs_a_in_b, n_a, share_bp) where
    * n_docs_a_in_b counts DISTINCT source-a docs with a VERIFIED
    * (word-shingle Jaccard ≥ `threshold`, exact — the bands only bound
    * the comparison set) partner in source_b, n_a is source-a's
    * comparable universe (docs yielding shingles — NULL/blank rows
    * cannot near-dup anything and sit out of both sides), and
    * share_bp = n_docs_a_in_b·10⁴ div n_a in exact integer basis
    * points (the skewStats arithmetic). The measure is ASYMMETRIC by
    * design — both directions of a pair are emitted; pairs sharing
    * nothing are absent. A NULL source is its own group (the
    * domainStats never-silently-drop contract).
    *
    * Scale shape (the [[minhashNearDups]] discipline, cross-source):
    * ONE narrow (band, bucket, id, source) exchange per side of the
    * self-join — shingle arrays never enter the candidate shuffle;
    * candidates dedup on the id pair and re-attach shingles for the
    * surviving few; the verify is the exact sorted-intersect Jaccard.
    * Same-source collisions drop INSIDE the band join (the audit is
    * cross-source; within-source duplication is [[minhashDedup]]'s
    * job), so the candidate volume is bounded by true cross-source
    * duplication + the band fpp trickle.
    *
    * Mega-group discipline: EXACT copies collapse per
    * (source, shingle set) BEFORE banding — one representative row
    * carrying its distinct-doc count. The matrix counts docs, and
    * every exact copy of a doc matches exactly what the doc matches,
    * so the collapse is semantics-preserving while bounding an exact
    * boilerplate group's pair volume by sources²/2 instead of g²/2
    * (the audit's common worst case — one page replicated millions of
    * times across a handful of crawls — goes from quadratic to flat;
    * CrossNearBench stage-profiled the uncollapsed regime at 31.7M
    * candidate rows for 6k copies at 300k docs). NEAR-but-not-exact
    * mega-groups (g mutually-similar DISTINCT texts) keep their g²/2
    * verified pairs — that is real duplication structure the audit is
    * asked to count; cap or pre-dedup upstream if a corpus is shaped
    * like that. The final matrix is source-cardinality-squared —
    * declared-few sources, the sourceOverlap contract. */
  def crossSourceNearDupOverlap(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, shingleSize: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"bands must divide numHashes (got bands=$bands, numHashes=$numHashes)")
    val rowsPerBand = numHashes / bands
    val raw = df.select(
        col(idCol).as("id"), col(sourceCol).as("src"),
        shingleHashUdf(Tools.tokenize(Tools.normalize(col(textCol))),
          lit(shingleSize)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    // the exact-collapse: one rep per (source, shingle set), keyed by a
    // deterministic 128-bit hash of the group (md5 over the struct's
    // JSON — r11 ADVICE: a 64-bit key has a non-negligible birthday
    // collision probability at billions of groups, and a collision
    // here silently MERGES two distinct groups, corrupting doc counts
    // with no error; 128 bits puts the bound past 2⁶⁰ groups). The key
    // rides as 16-byte BINARY (unhex of the md5 hex — the 32-char
    // string costs a measured ~25% extra band shuffle at 1M docs), so
    // the band exchange never carries the shingle arrays. cnt = how
    // many distinct docs the rep speaks for.
    val base = graft.engine.AutoUnpersist.cache(raw
      .groupBy(col("src"), col("shingles"))
      .agg(countDistinct(col("id")).as("cnt"))
      .withColumn("rep",
        unhex(md5(to_json(struct(col("src"), col("shingles")))))))
    val banded = base
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .select(col("rep"), col("src"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("rep"), col("src"), col("b.band"), col("b.bucket"))
    val a = banded.alias("a"); val b = banded.alias("b")
    // rep < rep dedups the unordered candidate; the DIRECTIONS are
    // re-expanded after the verify (one verified pair feeds both
    // (sa → sb) and (sb → sa) rows). NULL-safe inequality keeps the
    // NULL source a real group instead of silently dropping its pairs.
    // shuffle_hash pins (the q24/q112/cosineNearDupsLSH discipline):
    // every side here is corpus-sized and UDF-derived, so the static
    // planner under-estimates it and would BROADCAST — a plan AQE
    // cannot reverse at runtime and the fatal-at-scale shape
    // (PlanQualitySpec pins the shuffle join).
    val pairs = a.join(b.hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.rep") < col("b.rep") && !(col("a.src") <=> col("b.src")))
      .select(col("a.rep").as("rep_a"), col("a.src").as("src_a"),
        col("b.rep").as("rep_b"), col("b.src").as("src_b"))
      .distinct()
    val verified = pairs
      .join(base.select(col("rep").as("rep_a"), col("shingles").as("sh_a"),
        col("cnt").as("cnt_a")).hint("shuffle_hash"), "rep_a")
      .join(base.select(col("rep").as("rep_b"), col("shingles").as("sh_b"),
        col("cnt").as("cnt_b")).hint("shuffle_hash"), "rep_b")
      .withColumn("__inter",
        graft.functions.NativeExpressions.sortedIntersectCount(
          col("sh_a"), col("sh_b")).cast("double"))
      .withColumn("jaccard", round(
        col("__inter") / (size(col("sh_a")) + size(col("sh_b")) - col("__inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("rep_a", "src_a", "cnt_a", "rep_b", "src_b", "cnt_b")
    val dirs = verified
      .select(col("src_a").as("source_a"), col("src_b").as("source_b"),
        col("rep_a").as("__rep"), col("cnt_a").as("__cnt"))
      .unionByName(verified
        .select(col("src_b").as("source_a"), col("src_a").as("source_b"),
          col("rep_b").as("__rep"), col("cnt_b").as("__cnt")))
      // a rep matched by SEVERAL partner reps still speaks for its cnt
      // docs once per direction — dedup before the sum
      .distinct()
    val totals = broadcast(base.groupBy(col("src").as("__sa"))
      .agg(sum(col("cnt")).as("n_a")))
    dirs.groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("__cnt")).as("n_docs_a_in_b"))
      .join(totals, col("source_a") <=> col("__sa"), "left")
      .select(col("source_a"), col("source_b"), col("n_docs_a_in_b"),
        col("n_a"), expr("(n_docs_a_in_b * 10000L) div n_a").as("share_bp"))
  }

  /** Cross-source CONTAINMENT overlap — [[crossSourceNearDupOverlap]]'s
    * asymmetric-duplication sibling, for the subset duplication Jaccard
    * structurally misses across sources (a short doc quoted WHOLE
    * inside another crawl's long doc has containment 1.0 but Jaccard
    * only |A|/|B| — far below any near-dup threshold once sizes
    * diverge; exactly the gap [[containmentPairs]] closes within a
    * block, measured cross-source here). One row per ordered
    * co-occurring source pair:
    * (source_a, source_b, n_docs_a_in_b, n_a, share_bp) where
    * n_docs_a_in_b counts DISTINCT source-a docs with a VERIFIED
    * partner in source_b — n-word-shingle containment
    * |A∩B|·10⁴ div min(|A|,|B|) ≥ `thresholdBp`, exact long
    * arithmetic — n_a is source-a's comparable universe (docs yielding
    * shingles), share_bp = n_docs_a_in_b·10⁴ div n_a. The min-side
    * containment relation is symmetric, so a verified pair feeds both
    * directions (each reporting its own side's doc share); pairs
    * sharing nothing are absent; a NULL source is its own group.
    *
    * Scale shape — containmentPairs' pigeonhole machinery under
    * crossSourceNearDupOverlap's exact-copy collapse:
    *   - exact copies collapse per (source, shingle set) BEFORE
    *     anything runs (one 128-bit rep carrying its distinct-doc
    *     count — the q123 mega-group bound: a page replicated millions
    *     of times across a handful of crawls costs sources²/2 pairs,
    *     not copies²/2);
    *   - candidates are the min-side PREFIX × full POSTINGS join (for
    *     C(A,B) ≥ t the smaller set must share one of its first
    *     |S| − ceil(t·|S|) + 1 sorted grams — exact pigeonhole recall,
    *     not an LSH dial), cross-source only, gram keys 8 B;
    *   - `maxDocFreq` removes grams held by more than `cap` collapsed
    *     groups from the UNIVERSE itself (prefix, postings, intersects
    *     and denominators all see one consistent filtered universe —
    *     containmentPairs' boilerplate-blind discipline; frequency
    *     counts collapsed (source, shingle-set) GROUPS because posting
    *     fan-out is what the cap bounds; reps left gramless sit out);
    *   - verified candidates re-attach shingles for the exact
    *     merge-scan intersect; the matrix is source²-bounded
    *     (declared-few sources, the sourceOverlap contract).
    * NEAR-but-not-exact mega-groups keep their quadratic verified
    * pairs — real duplication structure the audit must count (the
    * crossSourceNearDupOverlap caveat applies verbatim). */
  def crossSourceContainmentOverlap(df: DataFrame, idCol: String,
      textCol: String, sourceCol: String, n: Int = 3,
      thresholdBp: Long = 9000L, maxDocFreq: Option[Int] = None)
      : DataFrame = {
    require(thresholdBp >= 1 && thresholdBp <= 10000,
      s"crossSourceContainmentOverlap: thresholdBp must be in " +
        s"[1, 10000], got $thresholdBp")
    maxDocFreq.foreach(cap => require(cap >= 1,
      s"crossSourceContainmentOverlap: maxDocFreq must be >= 1, got $cap"))
    val raw = df.select(
        col(idCol).as("id"), col(sourceCol).as("src"),
        shingleHash(col(textCol), n).as("grams"))
      .filter(size(col("grams")) > 0)
    // the q123 collapse with its 128-bit rep key (md5 over the group
    // struct, carried as 16-byte binary — a 64-bit key's birthday
    // collision would silently merge two groups at
    // billions-of-groups scale)
    val base0 = raw
      .groupBy(col("src"), col("grams"))
      .agg(countDistinct(col("id")).as("cnt"))
      .withColumn("rep",
        unhex(md5(to_json(struct(col("src"), col("grams"))))))
    val base = graft.engine.AutoUnpersist.cache(maxDocFreq match {
      case None => base0
      case Some(cap) =>
        // rebuild the gram sets WITHOUT the hot grams so the whole
        // plan sees one consistent filtered universe (containmentPairs'
        // exactness argument); rep/cnt are preserved per group — two
        // groups collapsing to the same filtered set stay separate
        // reps, which only means both match the same partners
        val ex = base0.select(col("rep"), col("src"), col("cnt"),
          explode(col("grams")).as("pg"))
        val hot = ex.groupBy("pg")
          .agg(count(lit(1)).as("__df")).filter(col("__df") > cap)
          .select("pg")
        ex.join(hot, Seq("pg"), "left_anti")
          .groupBy("rep", "src", "cnt")
          .agg(sort_array(collect_list(col("pg"))).as("grams"))
          .filter(size(col("grams")) > 0)
    })
    // prefix length over longs: |S| − ceil(t·|S|) + 1 with
    // ceil(a·b/10⁴) = (a·b + 9999) div 10⁴ (the containmentPairs
    // integer-exact quota)
    val pref = base.select(col("rep"), col("src"),
      explode(slice(col("grams"), lit(1),
        expr(s"cast(size(grams) - (cast(size(grams) as bigint) * " +
          s"$thresholdBp + 9999) div 10000 + 1 as int)"))).as("pg"))
    val post = base.select(col("rep"), col("src"),
      explode(col("grams")).as("pg"))
    val pa = pref.alias("pa")
    // shuffle_hash pinned: both sides are corpus-sized and UDF-derived
    // — the static planner's size estimate is fiction and a broadcast
    // here is the fatal-at-scale shape (the q112/q123 discipline)
    val pb = post.hint("shuffle_hash").alias("pb")
    val cand = pa.join(pb,
        col("pa.pg") === col("pb.pg") &&
          col("pa.rep") =!= col("pb.rep") &&
          !(col("pa.src") <=> col("pb.src")))
      .select(least(col("pa.rep"), col("pb.rep")).as("rep_a"),
        greatest(col("pa.rep"), col("pb.rep")).as("rep_b"))
      .distinct()
    val verified = cand
      .join(base.select(col("rep").as("rep_a"), col("src").as("src_a"),
        col("grams").as("sh_a"), col("cnt").as("cnt_a"))
        .hint("shuffle_hash"), "rep_a")
      .join(base.select(col("rep").as("rep_b"), col("src").as("src_b"),
        col("grams").as("sh_b"), col("cnt").as("cnt_b"))
        .hint("shuffle_hash"), "rep_b")
      .withColumn("__inter",
        graft.functions.NativeExpressions.sortedIntersectCount(
          col("sh_a"), col("sh_b")).cast("long"))
      .withColumn("containment_bp", expr("__inter * 10000 div " +
        "least(cast(size(sh_a) as bigint), cast(size(sh_b) as bigint))"))
      .filter(col("containment_bp") >= thresholdBp)
      .select("rep_a", "src_a", "cnt_a", "rep_b", "src_b", "cnt_b")
    val dirs = verified
      .select(col("src_a").as("source_a"), col("src_b").as("source_b"),
        col("rep_a").as("__rep"), col("cnt_a").as("__cnt"))
      .unionByName(verified
        .select(col("src_b").as("source_a"), col("src_a").as("source_b"),
          col("rep_b").as("__rep"), col("cnt_b").as("__cnt")))
      // a rep matched by SEVERAL partner reps still speaks for its cnt
      // docs once per direction — dedup before the sum
      .distinct()
    val totals = broadcast(base.groupBy(col("src").as("__sa"))
      .agg(sum(col("cnt")).as("n_a")))
    dirs.groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("__cnt")).as("n_docs_a_in_b"))
      .join(totals, col("source_a") <=> col("__sa"), "left")
      .select(col("source_a"), col("source_b"), col("n_docs_a_in_b"),
        col("n_a"), expr("(n_docs_a_in_b * 10000L) div n_a").as("share_bp"))
  }

  /** [[incrementalNearDedup]] against a persisted index — drop verdicted
    * rows, then [[minhashDedup]] within the survivors with the INDEX
    * MANIFEST's signature parameters, so the vs-corpus and within-batch
    * criteria cannot drift. */
  def incrementalNearDedupIndexed(batch: DataFrame, indexPath: String,
      idCol: String, textCol: String, threshold: Double = 0.6,
      bloomFpp: Option[Double] = None): DataFrame = {
    val (shingleSize, numHashes, bands, _) =
      readNearDupManifest(batch.sparkSession, indexPath).getOrElse(sys.error(
        s"no near-dup index manifest at $indexPath (incomplete build? " +
          "rebuild with writeNearDupIndex)"))
    val verdicts = incrementalNearDupsIndexed(batch, indexPath, idCol,
      textCol, threshold, bloomFpp)
    val novel = batch.join(
      verdicts.filter(!col("kept")).select(col(idCol)), Seq(idCol), "left_anti")
    minhashDedup(novel, idCol, textCol, threshold,
      shingleSize = shingleSize, numHashes = numHashes, bands = bands)
  }

  /** The survivor rule shared by the cluster-dedup family ([[minhashDedup]],
    * [[embeddingDedup]]): connected components over the candidate pairs,
    * keep the minimum id per cluster — ONE implementation so the two
    * methods' advertised "same keep-min contract" cannot drift. */
  private def keepMinPerCluster(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val comps = ConnectedComponents.run(pairs.select("id_a", "id_b"))
    val losers = comps.filter(col("node") =!= col("comp"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster survivor: per connected component keep the
    * max-`scoreCol` row (ties → min id; NULL scores last). Rows that
    * never paired are all kept — they have no cluster. One window
    * exchange over the (small) clustered subset only; the un-paired
    * bulk of the corpus passes through an anti join untouched. */
  private def keepBestPerCluster(df: DataFrame, idCol: String,
      pairs: DataFrame, scoreCol: String): DataFrame = {
    val comps = ConnectedComponents.run(pairs.select("id_a", "id_b"))
    val inComp = df.join(comps, df(idCol) === comps("node")).drop("node")
    val w = Window.partitionBy(col("comp"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol))
    val best = inComp.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk", "comp")
    df.join(comps, df(idCol) === comps("node"), "left_anti")
      .unionByName(best)
  }

  /** Semantic dedup over an embedding column — the SemDeDup shape (Abbas
    * et al. 2023, arXiv:2303.09540): bucket by LSH instead of k-means
    * cells (same role — bound the comparison set; an LSH bucket join is
    * one shuffle and needs no model fit), exact-cosine-verify candidates
    * at `threshold`, connected components over the surviving pairs, keep
    * the minimum id per cluster. Identical vectors collide in every LSH
    * table, so exact-duplicate recall is certain; near-duplicate recall
    * follows the cosineNearDupsLSH table/bit dials.
    * Same keep-min contract as [[minhashDedup]] (or keep-best via
    * `keepScore`). */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 3,
      keepScore: Option[String] = None): DataFrame = {
    val pairs = graft.sim.Ann.cosineNearDupsLSH(df, idCol, vecCol,
      threshold, bits, tables)
    keepScore match {
      case None => keepMinPerCluster(df, idCol, pairs)
      case Some(s) => keepBestPerCluster(df, idCol, pairs, s)
    }
  }

  // -------------------------------------------------------------- SimHash
  /** 64-bit SimHash of a token array: per-token 64-bit hash votes on each
    * bit; bit set where the vote sum is positive. UDF (per-bit loop), but
    * row-local — no shuffle. */
  private val simhashUdf = udf { (tokens: Seq[String]) =>
    if (tokens == null || tokens.isEmpty) 0L
    else {
      val votes = new Array[Int](64)
      tokens.foreach { t =>
        val h = scala.util.hashing.MurmurHash3.stringHash(t, 0).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(t, 1).toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }
  def simhash64(tokens: Column): Column = simhashUdf(tokens)

  /** 60-bit SimHash with an md5-based token hash: the top 15 hex chars
    * of md5(token) as the per-token hash (md5 is computable in any SQL
    * engine — `('0x' || substr(md5(t),1,15))::BIGINT` in DuckDB matches
    * bit-for-bit), so this variant is ORACLE-CHECKABLE end to end where
    * the murmur3 one is Spark-only. 60 bits keep the value inside a
    * signed long; bands divide 60. Slower than murmur3 (MessageDigest
    * per token) — the default stays murmur3. */
  private val simhashMd5Udf = udf { (tokens: Seq[String]) =>
    if (tokens == null || tokens.isEmpty) 0L
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](60)
      tokens.foreach { t =>
        val h = Tools.md5Top60(
          md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        md.reset()
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      var out = 0L
      var i = 0
      while (i < 60) { if (votes(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }
  def simhash60Md5(tokens: Column): Column = simhashMd5Udf(tokens)

  /** Hamming distance between two 64-bit signatures (codegen:
    * bit_count(xor)). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on `bands` equal-width sub-bands of
    * the 64-bit signature, then verify the full hamming distance. The
    * pigeonhole guarantee: a pair within hamming distance ≤ bands-1 has
    * at least one band with ZERO differing bits, so banding is
    * total-recall up to that bound — `maxHamming < bands` is REQUIRED so
    * the operator never silently under-recalls (more bands = wider
    * guarantee but shorter band keys = more candidate collisions). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4, algo: String = "murmur3"): DataFrame = {
    // "md5" trades hash speed for cross-engine reproducibility (60-bit
    // signature an external SQL oracle can recompute); "murmur3" is the
    // fast 64-bit production default
    val nBits = algo match {
      case "murmur3" => 64
      case "md5"     => 60
      case other => sys.error(s"simhash algo must be murmur3 or md5, got $other")
    }
    require(bands >= 2 && nBits % bands == 0, s"bands must divide $nBits, got $bands")
    require(maxHamming < bands,
      s"banding recall guarantee requires maxHamming < bands " +
        s"(got maxHamming=$maxHamming, bands=$bands): a pair at distance " +
        s">= bands can differ in every band and be missed")
    val width = nBits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val toks = Tools.tokenize(Tools.normalize(col(textCol)))
    val sig = df.select(col(idCol).as("id"),
      (if (algo == "md5") simhash60Md5(toks) else simhash64(toks)).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * width).bitwiseAND(lit(mask)).as("key"))): _*))
        .as("b"))
      .select(col("id"), col("sig"), col("b.band"), col("b.key"))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ------------------------------------------------- n-gram Jaccard pairs
  /** Exhaustive n-gram Jaccard within a blocking key (e.g. source, length
    * band): cheap exact near-dup scoring when blocks are small. */
  // intersection of sorted long arrays: native codegen'd expression
  // (NativeExpressions.sortedIntersectCount) — unboxed merge scan

  /** Document frequencies of a gram frame's universe as a count-gated
    * driver map — the rarest-first prefix order's input (r15
    * optimization, shared by the whole prefix-filter family). ONE
    * bounded action: limit(cap+1) caps what the driver ever holds; a
    * result under the cap is necessarily the COMPLETE df table, over it
    * returns None and callers keep the sorted-hash prefix order (both
    * orders are exact — the verify join decides every pair; the order
    * is purely a candidate-volume dial). `g` must expose an array
    * column named `grams`. */
  private def gramDfMap(g: DataFrame): Option[Map[Long, Long]] = {
    val dfCap = 1 << 22
    val rows = g.select(explode(col("grams")).as("__g"))
      .groupBy("__g").agg(count(lit(1)).as("__df"))
      .limit(dfCap + 1).collect()
    if (rows.length <= dfCap)
      Some(rows.map(r => (r.getLong(0), r.getLong(1))).toMap)
    else None
  }

  /** The first `prefLenOf(|grams|)` grams in ascending (document
    * frequency, gram) order — Bayardo's canonical prefix order: the
    * prefix then holds each doc's RAREST grams, so the candidate join
    * meets only through rare grams instead of fanning out on
    * boilerplate (the sorted-hash order is a RANDOM order; at sf0.1
    * the q24 candidate set measured 622k pairs from 5k docs under it).
    * The pigeonhole is order-independent: under any one global total
    * order, if no common gram sat in both prefixes, all |A∩B| common
    * grams would fit in one suffix of size ceil(t·|X|)−1 < |A∩B|. */
  private def rarestPrefixUdf(spark: org.apache.spark.sql.SparkSession,
      m: Map[Long, Long], prefLenOf: Int => Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(m)
    udf { grams: Seq[Long] =>
      if (grams == null) Seq.empty[Long]
      else {
        val k = prefLenOf(grams.length)
        if (k <= 0) Seq.empty[Long]
        else {
          val dfm = bc.value
          grams.sortBy(gr => (dfm.getOrElse(gr, 0L), gr)).take(k)
        }
      }
    }
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // gram sets as SORTED long hashes: set cardinalities are unchanged
    // (64-bit collisions are negligible), intersection becomes a
    // primitive merge scan instead of a string hash set per pair.
    // AutoUnpersist-scoped cache: the frame feeds the prefix index AND
    // two verify-side joins — without it each branch re-runs the gram
    // kernel; released after the caller's action completes.
    def gramFrame = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      sort_array(array_distinct(transform(
        Tools.charNgrams(Tools.normalize(col(textCol)), n), s => xxhash64(s))))
        .as("grams"))
    // persist FIRST, register with AutoUnpersist LAST (below, after the
    // df-table action): the df-table collect then both BUILDS the cache
    // and reads it without counting as the scope's first action — the
    // kernel runs once for the df table, the prefix index, and both
    // verify joins together.
    val g = gramFrame.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PREFIX FILTERING (Bayardo et al., "Scaling Up All Pairs Similarity
    // Search", WWW'07): J(A,B) >= t implies |A∩B| >= ceil(t·|A|), and by
    // pigeonhole any B meeting that overlap must share at least one of
    // A's first |A| - ceil(t·|A|) + 1 grams IN SORTED ORDER. So instead
    // of enumerating every same-block pair (O(block²), the former plan),
    // candidates meet through ONE equi-join on (block, prefix gram) —
    // candidate volume tracks actual similarity, not block size. The
    // sorted-hash order doubles as the canonical prefix order.
    // EFFECTIVE threshold for every candidate-stage bound (r16, the r15
    // advice): the verify admits pairs whose ROUNDED 4-decimal jaccard
    // clears `threshold`, i.e. true J down to threshold − 5e-5 — the
    // pigeonhole arithmetic must prune against THAT bound or a
    // borderline pair in the rounding band could lose its only meeting
    // row. teff only ever lengthens prefixes / lowers `required` (a
    // candidate superset), so pruning stays one-sided.
    val teff = threshold - 5e-5
    val prefLen = (size(col("grams")) - ceil(lit(teff) * size(col("grams"))) + 1)
      .cast("int")
    // PREFIX ORDER (r15 optimization): rarest-first prefixes via the
    // shared [[gramDfMap]]/[[rarestPrefixUdf]] machinery (see their
    // scaladoc for the order-independence argument and the count-gated
    // fallback). prefLenOf spells the SAME double-ceil arithmetic as
    // the `prefLen` Column above so the two prefix modes can never
    // disagree on a boundary.
    val rarestPrefix: Option[Column] = gramDfMap(g).map { m =>
      rarestPrefixUdf(df.sparkSession, m,
        len => (len - math.ceil(teff * len) + 1).toInt)(col("grams"))
    }
    graft.engine.AutoUnpersist.cache(g, drainFirst = true)
    val pref = g.select(col("id"), col("block"), size(col("grams")).as("sz"),
      posexplode(rarestPrefix.getOrElse(
        slice(col("grams"), lit(1), prefLen))).as(Seq("pos", "pg")))
    val pa = pref.alias("pa")
    val pb = pref.hint("shuffle_hash").alias("pb")
    // POSITIONAL + SIZE FILTERS inside the candidate join (PPJoin, Xiao
    // et al. WWW'08 — exact, they prune meeting ROWS before the
    // distinct exchange, never pairs the verify would keep):
    // - size ratio: J ≤ min/max sizes, spelled EXACTLY like the verify
    //   filter so the two can never disagree on a boundary double;
    // - position: a qualifying pair's FIRST common gram (global order)
    //   sits in both prefixes (else all common grams fit in one
    //   suffix of size ceil(t·|X|)−1 < |A∩B|), and every common gram
    //   ranks after it on BOTH sides, so |A∩B| ≤ 1 + min(|A|−1−posA,
    //   |B|−1−posB) at that meeting — rows whose bound can't reach the
    //   equivalent-overlap requirement ceil(t(|A|+|B|)/(1+t)) drop
    //   here (the 1e-9 relaxation keeps the double ceil from ever
    //   exceeding the exact requirement, and t is the EFFECTIVE
    //   verify threshold teff — see above — so pruning stays
    //   one-sided for every pair the rounded verify admits).
    //   Later meetings of a true pair may fail the bound — irrelevant,
    //   its first meeting's row survives and distinct keeps the pair.
    val required = ceil(lit(teff / (1.0 + teff)) *
      (col("pa.sz") + col("pb.sz")) - 1e-9)
    val ubound = lit(1) + least(col("pa.sz") - 1 - col("pa.pos"),
      col("pb.sz") - 1 - col("pb.pos"))
    val cand = pa.join(pb,
        col("pa.block") === col("pb.block") && col("pa.pg") === col("pb.pg") &&
          col("pa.id") < col("pb.id") &&
          least(col("pa.sz"), col("pb.sz")).cast("double") /
            greatest(col("pa.sz"), col("pb.sz")) >= threshold &&
          ubound >= required)
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
      .distinct()
    // verify: re-attach the gram sets for the surviving candidates only;
    // the length-ratio bound (J ≤ min/max sizes) skips impossible pairs
    // before the merge intersect. shuffle_hash pinned: the gram corpus
    // is corpus-sized and UDF-derived (the static planner under-
    // estimates it and would happily broadcast the whole thing — the
    // PlanQualitySpec guard exists precisely for that)
    val out = cand
      .join(g.select(col("id").as("id_a"), col("grams").as("ga"))
        .hint("shuffle_hash"), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("gb"))
        .hint("shuffle_hash"), "id_b")
      .filter(least(size(col("ga")), size(col("gb"))).cast("double") /
        greatest(size(col("ga")), size(col("gb"))) >= threshold)
      .withColumn("inter",
        graft.functions.NativeExpressions.sortedIntersectCount(
          col("ga"), col("gb")).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("ga")) + size(col("gb")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    out
  }

  // ------------------------------------------------ duplication weights
  /** SOFT dedup: instead of dropping duplicates, stamp every row with
    * its content-group size and the proportional down-weight
    * `weight_bp = 10⁴ div dup_count` — each duplicate group then
    * contributes one document's worth of total sampling mass (up to
    * the div floor), the frequency-reweighting alternative to hard
    * removal used when duplicates carry signal (popular ≠ redundant —
    * hard dedup erases the popularity prior, down-weighting keeps it
    * bounded). Compose with the `sample` step's rate column or a
    * training loader's per-example weights.
    *
    * Keys: `exact` = md5 of the raw text (the [[exactGroups]] key);
    * `fingerprint` = md5 of sorted distinct normalized tokens (the
    * [[fingerprint]] key — order/casing/punctuation-blind). NULL texts
    * keep (NULL, NULL) — the family's NULL-key contract: a missing doc
    * is not a duplicate of every other missing doc, and unknown ≠
    * down-weighted. ONE content-key exchange (a count window, no join
    * back); weight arithmetic is exact long division, so every weight
    * replays externally. */
  def duplicationWeights(df: DataFrame, idCol: String, textCol: String,
      method: String = "exact"): DataFrame = {
    val key = method match {
      case "exact"       => md5(col(textCol).cast("binary"))
      case "fingerprint" => fingerprint(col(textCol))
      case other => sys.error(
        s"duplicationWeights: method must be exact or fingerprint, got $other")
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
    // NULL-text rows route AROUND the window, not through it: their
    // output is unconditionally (NULL, NULL), but partitionBy would
    // still hash every NULL key into ONE task — a straggler/OOM hazard
    // when a big corpus has a real missing-text fraction (the
    // keepMinPerKey split, same reason)
    val keyed = df.withColumn("__k", key)
    keyed.filter(col("__k").isNotNull)
      .withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("weight_bp", expr("10000 div dup_count"))
      .unionByName(keyed.filter(col("__k").isNull)
        .withColumn("dup_count", lit(null).cast("long"))
        .withColumn("weight_bp", lit(null).cast("long")))
      .drop("__k")
  }

  // ------------------------------------------------- containment pairs
  /** Near-SUBSET duplication within a blocking key: pairs whose n-gram
    * CONTAINMENT |A∩B| / min(|A|,|B|) clears `thresholdBp` basis
    * points. This is the asymmetric-duplication detector Jaccard
    * structurally misses: a short doc quoted whole inside a long one
    * (syndicated article + commentary, a chunk re-packed into a larger
    * shard, quoted boilerplate) has containment 1.0 but Jaccard only
    * |A|/|B| — far below any near-dup threshold once sizes diverge.
    *
    * Candidates: for C(A,B) ≥ t the SMALLER set must share at least
    * ceil(t·|S_min|) grams, so by pigeonhole it shares one of its first
    * |S| − ceil(t·|S|) + 1 sorted grams — each doc's own-size prefix
    * (valid precisely when that doc IS the min side) joins against the
    * FULL gram postings of its block, both directions at once (the
    * id ≠ id join sees (small, big) from the small side's prefix).
    * Unlike the Jaccard prefix join this meets prefix × postings, not
    * prefix × prefix — containment constrains only the smaller side,
    * so the big side must be fully indexed. `maxDocFreq` REMOVES grams
    * whose block-level document frequency exceeds the cap from the
    * gram universe itself before anything else runs (boilerplate-blind
    * containment — the C4 line-dedup spirit applied to the similarity
    * space): boilerplate grams shared by half the block would
    * otherwise fan the candidate join toward all-pairs, and merely
    * dropping them from the postings side would silently lose pairs
    * whose short prefix IS a hot gram (a high threshold makes the
    * prefix a single gram — the spec's exact-dup-plus-boilerplate case
    * caught exactly that). Removing them from the universe keeps the
    * plan EXACT with respect to the filtered metric: same candidates,
    * same intersects, same denominators. Docs left gramless by the
    * filter sit out, and the cap costs one extra (block, gram)
    * docfreq exchange — capped mode only. Verification is exact either
    * way: surviving candidates re-attach both gram sets and the
    * merge-scan intersect decides.
    *
    * `unit` picks the gram universe, and at scale the choice IS the
    * plan: `"word"` (n-word shingles, the minhash unit — DEFAULT for
    * document corpora) has a universe ∝ vocabulary^n, so posting lists
    * stay short and cost tracks gram volume; `"char"` (n-char grams,
    * the short-string/fuzzy-name unit, q24's) has a universe bounded
    * by alphabet^n — a few thousand distinct trigrams corpus-wide — so
    * beyond ~10³-doc blocks most grams sit in most docs and the
    * prefix × postings join degenerates toward block² (ContainBench
    * measured the uncapped char path OOMing local[32] at 100k
    * synthetic docs; the word path sweeps linearly). Use char only on
    * small blocks or with `maxDocFreq`.
    *
    * containment_bp = inter·10⁴ div min(|A|,|B|) in exact long
    * arithmetic (hash-stable across engines). Docs with no grams
    * (NULL / blank; in char mode also shorter than n after normalize —
    * word mode folds short docs into one whole-text shingle, the
    * minhash contract) sit out — containment over an empty set is
    * undefined, not 0 or 1. Output: (id_a, id_b, containment_bp) with
    * id_a < id_b. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 3, thresholdBp: Long = 9000L,
      maxDocFreq: Option[Int] = None, unit: String = "word"): DataFrame = {
    require(thresholdBp >= 1 && thresholdBp <= 10000,
      s"containmentPairs: thresholdBp must be in [1, 10000], got $thresholdBp")
    maxDocFreq.foreach(cap => require(cap >= 1,
      s"containmentPairs: maxDocFreq must be >= 1, got $cap"))
    val gramSet = unit match {
      // shingleHash already returns the sorted distinct hash set
      case "word" => shingleHash(col(textCol), n)
      case "char" => sort_array(array_distinct(transform(
        Tools.charNgrams(Tools.normalize(col(textCol)), n), s => xxhash64(s))))
      case other => sys.error(
        s"containmentPairs: unit must be word or char, got $other")
    }
    // the cached gram frame feeds prefix, postings AND two verify-side
    // re-attach joins (the ngramJaccardPairs cache rationale)
    val g0 = graft.engine.AutoUnpersist.cache(
      df.select(col(idCol).as("id"), col(blockCol).as("block"),
        gramSet.as("grams"))
        .filter(size(col("grams")) > 0))
    // the capped mode rebuilds the gram sets WITHOUT the hot grams so
    // prefix, postings, intersects and denominators all see one
    // consistent filtered universe (see the scaladoc)
    val g = maxDocFreq match {
      case None => g0
      case Some(cap) =>
        val ex = g0.select(col("id"), col("block"),
          explode(col("grams")).as("pg"))
        val hot = ex.groupBy("block", "pg")
          .agg(count(lit(1)).as("__df")).filter(col("__df") > cap)
          .select("block", "pg")
        graft.engine.AutoUnpersist.cache(
          ex.join(hot, Seq("block", "pg"), "left_anti")
            .groupBy("id", "block")
            .agg(sort_array(collect_list(col("pg"))).as("grams"))
            .filter(size(col("grams")) > 0))
    }
    // prefix length over longs: |S| − ceil(t·|S|) + 1 with
    // ceil(a·b/10⁴) = (a·b + 9999) div 10⁴ — exact integer, no float
    // boundary (the selectTopFraction quota discipline). NOTE (r15):
    // both the rarest-first prefix order and the PPJoin positional
    // filter that pay off for the Jaccard prefix × prefix join were
    // A/B'd here and REVERTED — the containment prefix is already
    // short (len/10 at 9000 bp), candidates are verify-bounded, and
    // the extra per-meeting-row work measured q112 1.55 → 2.0–2.9 s.
    val pref = g.select(col("id"), col("block"),
      explode(slice(col("grams"), lit(1),
        expr(s"cast(size(grams) - (cast(size(grams) as bigint) * $thresholdBp" +
          s" + 9999) div 10000 + 1 as int)"))).as("pg"))
    val post = g.select(col("id"), col("block"), explode(col("grams")).as("pg"))
    val pa = pref.alias("pa")
    // shuffle_hash pinned for the same reason as the Jaccard join: the
    // posting index is corpus-sized and UDF-derived — the static
    // planner's estimate is fiction
    val pb = post.hint("shuffle_hash").alias("pb")
    val cand = pa.join(pb,
        col("pa.block") === col("pb.block") && col("pa.pg") === col("pb.pg") &&
          col("pa.id") =!= col("pb.id"))
      .select(least(col("pa.id"), col("pb.id")).as("id_a"),
        greatest(col("pa.id"), col("pb.id")).as("id_b"))
      .distinct()
    cand
      .join(g.select(col("id").as("id_a"), col("grams").as("ga"))
        .hint("shuffle_hash"), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("gb"))
        .hint("shuffle_hash"), "id_b")
      .withColumn("inter",
        graft.functions.NativeExpressions.sortedIntersectCount(
          col("ga"), col("gb")).cast("long"))
      .withColumn("containment_bp",
        expr("inter * 10000 div least(cast(size(ga) as bigint), cast(size(gb) as bigint))"))
      .filter(col("containment_bp") >= thresholdBp)
      .select("id_a", "id_b", "containment_bp")
  }
}
