package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity-search operators over `array<float>` columns.
  *
  * Two tiers:
  *   - brute-force cosine top-k (broadcast the query set; exact), and
  *   - LSH-bucketed ANN (random-hyperplane signatures; candidate equi-join
  *     on bucket key — the 100 TB path: shuffle on bucket, never cartesian).
  *
  * Scalar math runs in tight-loop JVM kernels ([[Kernels]]) in double
  * precision — Spark's higher-order functions are interpreted
  * (CodegenFallback), which is 3-5x slower for this shape.
  */
object SimilarityFunctions {

  /** Dot product of two array<numeric> columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array<numeric> column, in double. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity between two array<float> columns: native codegen
    * Catalyst expression ([[org.apache.spark.sql.graft.CosineSimilarity]]);
    * identical ascending fold order across the expression, the UDF kernel
    * and the DuckDB oracle, so results are bit-stable. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.cosineSim(a, b)

  /** Exact brute-force cosine top-k neighbors for each query vector.
    *
    * The query side is broadcast (it is small by construction); the corpus
    * streams through map-side — no shuffle of the corpus. Top-k per query
    * uses a rank window on the (queries x corpus) result, which is
    * |queries| * |corpus| rows map-side but only k rows per query survive.
    *
    * @return (query_id, neighbor_id, score) with rank <= k per query
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cvec"))
      .join(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("score"))
    rankTopK(scored, k)
  }

  /** Per-query top-k via the bounded [[TopKAggregator]]: map-side partial
    * top-k means only ~k rows per query per partition are shuffled,
    * instead of every scored candidate as a rank window would. Output is
    * bit-identical to `row_number() OVER (ORDER BY score DESC, id ASC)`. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k, col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.neighbor_id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).as("rnk"))

  /** Random-hyperplane LSH signature: `numBits` sign bits of dot products
    * with deterministic pseudo-random hyperplanes. The hyperplane
    * component for (bit i, dim j) is the low 24 bits of
    * `md5("plane-i-j")` scaled to [-1, 1) — uniform (unlike a `% 1000`
    * fold, which is sign-skewed), free of driver-side RNG state, an
    * EXACT dyadic rational (h/2^23 - 1, so the double is bit-identical
    * in any engine), and reproducible in a SQL oracle from md5() alone.
    * Computed by a tight-loop kernel over the precomputed plane matrix.
    */
  def lshSignature(vec: Column, dim: Int, numBits: Int): Column = {
    val planes = lshPlanes(dim, numBits)
    val f = org.apache.spark.sql.functions.udf { (v: Seq[Float]) =>
      if (v == null) null.asInstanceOf[java.lang.Long]
      else java.lang.Long.valueOf(lshSignatureOf(v, planes))
    }
    f(vec)
  }

  /** The deterministic md5-derived hyperplane matrix behind
    * [[lshSignature]] (see there for the derivation contract). */
  def lshPlanes(dim: Int, numBits: Int): Array[Array[Double]] =
    Array.tabulate(numBits, dim) { (i, j) =>
      (Kernels.md5Hash60(s"plane-$i-$j") % (1 << 24)).toDouble / (1 << 23) - 1.0
    }

  /** Driver/closure-side signature of one vector — bit-identical to the
    * [[lshSignature]] column (same ascending fold, same sign rule), for
    * code that must probe a vector's cell outside a DataFrame (e.g. an
    * IVF exact-match probe function). */
  def lshSignatureOf(v: Seq[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val plane = planes(i)
      var proj = 0.0
      var j = 0
      val n = math.min(plane.length, v.length)
      while (j < n) { proj += v(j).toDouble * plane(j); j += 1 }
      if (proj > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Per-band LSH keys: band `b`'s key packs the sign bits of planes
    * `[b*rows, (b+1)*rows)` — bit-identical to slicing the packed
    * [[lshSignature]] long when `rows * numBands <= 64`, but with NO
    * 64-bit width ceiling. The packed form caps 4-band signatures at 16
    * rows/band, which stops the per-band key space at 65k cells — past
    * ~16k vectors random collisions grow quadratically again (measured:
    * 241x wall at the 500x/1M-vector point). Per-band keys keep
    * `2^rows >= 4n` to a billion vectors per band. */
  def lshBandKeys(vec: Column, dim: Int, rows: Int, numBands: Int): Column = {
    val planes = lshPlanes(dim, rows * numBands)
    val f = org.apache.spark.sql.functions.udf { (v: Seq[Float]) =>
      if (v == null) null else lshBandKeysOf(v, planes, rows, numBands)
    }
    f(vec)
  }

  /** Driver/closure-side form of [[lshBandKeys]] (same fold and sign
    * rule as [[lshSignatureOf]], sliced per band at construction). */
  def lshBandKeysOf(v: Seq[Float], planes: Array[Array[Double]],
      rows: Int, numBands: Int): Array[Long] = {
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var j = 0
      while (j < rows) {
        val plane = planes(b * rows + j)
        var proj = 0.0
        var d = 0
        val n = math.min(plane.length, v.length)
        while (d < n) { proj += v(d).toDouble * plane(d); d += 1 }
        if (proj > 0) keys(b) |= (1L << j)
        j += 1
      }
      b += 1
    }
    keys
  }

  /** LSH-bucketed approximate top-k: candidates share at least one band of
    * the hyperplane signature; exact cosine re-rank inside candidates.
    * Trades recall for removing the |corpus| x |queries| blow-up — at scale
    * both sides shuffle on (band, key) only.
    *
    * @param probeBitFlips multi-probe level: 0 probes only each band's
    *        own bucket (exact-match LSH, the hash-verifiable default);
    *        1 additionally probes every single-bit-flip neighbor of each
    *        QUERY band key — rowsPerBand extra probes per band per query,
    *        a large recall gain for near-boundary vectors at zero corpus
    *        cost (the corpus posting side is untouched; only the
    *        broadcast query-key set grows). */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, numBits: Int = 16, numBands: Int = 4,
      probeBitFlips: Int = 0): DataFrame = {
    require(probeBitFlips == 0 || probeBitFlips == 1,
      "probeBitFlips supports 0 (exact bucket) or 1 (single-bit multi-probe)")
    val rows = numBits / numBands
    // Candidate generation is id-only: the bucket join and the
    // (query, neighbor) dedup shuffle carry no vectors; vectors join back
    // only for surviving pairs (queries broadcast — small by construction;
    // corpus vectors via a column-pruned scan).
    def banded(df: DataFrame, id: String, vec: String, idOut: String,
        flips: Int) =
      df.select(col(id).as(idOut),
        lshSignature(col(vec), dim, numBits).as("sig"))
        .select(col(idOut),
          explode(array((0 until numBands).flatMap { b =>
            val key = shiftright(col("sig"), b * rows)
              .bitwiseAND(lit((1L << rows) - 1))
            val own = struct(lit(b).as("band"), key.as("key"))
            val flipped =
              if (flips == 0) Seq.empty
              else (0 until rows).map(bit =>
                struct(lit(b).as("band"),
                  key.bitwiseXOR(lit(1L << bit)).as("key")))
            own +: flipped
          }: _*)).as("bk"))
        .select(col(idOut), col("bk.band").as("band"), col("bk.key").as("key"))
    val c = banded(corpus, corpusId, corpusVec, "neighbor_id", flips = 0)
    val q = banded(queries, queryId, queryVec, "query_id", probeBitFlips)
      .dropDuplicates("query_id", "band", "key")
    val cands = c.join(broadcast(q), Seq("band", "key"))
      .where(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val qv = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))
    val cv = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cvec"))
    val scored = cands
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("score"))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nLists` Voronoi cells via MLlib KMeans (trained on a bounded,
    * deterministic sample), assign every vector to its nearest centroid,
    * and probe only the `nProbe` closest cells per query — the classic
    * IVF-Flat trade of recall for a |corpus|/nLists * nProbe candidate
    * set. Cell assignment is a tiny broadcast (centroid matrix) and the
    * candidate generation is an equi-join on the cell id, so the plan
    * shuffles on cell only — the right shape for a billion-vector corpus.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4,
      trainSampleSize: Int = 10000): DataFrame =
    IvfIndex.build(corpus, corpusId, corpusVec, nLists, trainSampleSize)
      .search(queries, queryId, queryVec, k, nProbe)

  /** Exact integer ceil(log2(n)): the smallest c with 2^c >= n (0 for
    * n <= 1). Integer arithmetic, not floating log — an FP log2 can land
    * on either side of a power of two depending on libm, and this value
    * must match the SQL oracle's derivation bit-for-bit. */
  def ceilLog2(n: Long): Int =
    if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)

  /** Corpus-adaptive rows per band: clamp(ceilLog2(n) + 2, 4, 30).
    *
    * Rationale: expected random-collision candidates per band are
    * ~ n^2 / 2^rows; with 2^rows >= 4n that is <= n/4 — LINEAR in corpus
    * size, which is the whole point of banding. The +2 margin keeps the
    * per-band key space at >= 4x the corpus; the floor of 4 keeps tiny
    * corpora off degenerate 1-bucket keys. The cap was 16 rows while
    * band keys were sliced out of one packed 64-bit signature; since
    * [[lshBandKeys]] derives each band's key independently the cap is
    * 30 (a billion cells per band — `2^rows >= 4n` holds to 268M
    * vectors), and the round-16 500x measurement motivating the change
    * is recorded in PLANS.md. */
  def adaptiveRows(corpusCount: Long): Int =
    math.min(30, math.max(4, ceilLog2(corpusCount) + 2))

  /** Bands grow with the key width to HOLD the S-curve catch point as
    * the corpus scales: a true pair at cos 0.99 band-matches with
    * p = s^rows (s ~ 0.955), so widening rows 16 -> 22 alone drops the
    * 4-band catch 93% -> 84%. Keeping rows/bands ~ 4 pins the pivot:
    * bands = max(base, ceil(rows/4)) gives 4 bands at rows <= 16
    * (every gate corpus — behavior unchanged) and 6 bands at the
    * 1M-vector point (catch 93.3%). Candidates stay <= n/4 per band,
    * so total work is ~ n * log(n)/16 — near-linear. */
  def adaptiveBands(rows: Int, baseBands: Int = 4): Int =
    math.max(baseBands, (rows + 3) / 4)

  /** All corpus pairs with cosine similarity >= threshold via LSH buckets
    * (embedding near-duplicate detection).
    *
    * OPERATING POINT (measured, see PLANS.md SCALING): banded sign-LSH is
    * a NEAR-duplicate detector — band-match probability is
    * (1 - acos(cos)/pi)^rowsPerBand per band, ~93% catch at cos 0.99 but
    * ~3e-4 per band at cos 0.3 (sampled recall 7% at that threshold).
    * Use thresholds >= ~0.85 here; for low-threshold pair retrieval use
    * [[bruteForceTopK]] or [[ivfTopK]].
    *
    * `numBits` is the scale knob: the key space must grow with the corpus
    * (8-bit keys collide ~0.4% of ALL pairs at 400k vectors — the
    * quadratic regime banding exists to avoid). The default (0) derives
    * it from the corpus count ([[adaptiveRows]]/[[adaptiveBands]]) — the
    * auto path localCheckpoints the (id, vec) projection first, so the
    * count and every downstream branch read the materialized copy (a
    * computed upstream pipeline executes once, and the source is not
    * re-scanned per branch); pass an explicit value to pin the width
    * and skip the checkpoint. */
  def embeddingNearDuplicates(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double,
      numBits: Int = 0, numBands: Int = 4,
      maxBucketSize: Int = 100000,
      dropObservation: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    embeddingVerifiedPairs(df, idCol, vecCol, dim, threshold, numBits,
      numBands, maxBucketSize, dropObservation, withScore = true)
      .dropDuplicates("id_a", "id_b")

  /** The PRE-dedup verified pair multiset behind
    * [[embeddingNearDuplicates]]: a pair colliding in several bands
    * appears once per collision, and no score column is computed. The
    * edge SET is identical to the deduped output, which is all a
    * connected-components consumer reads. */
  private[graft] def embeddingNearDuplicateMultiset(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double,
      numBits: Int = 0, numBands: Int = 4,
      maxBucketSize: Int = 100000,
      dropObservation: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    embeddingVerifiedPairs(df, idCol, vecCol, dim, threshold, numBits,
      numBands, maxBucketSize, dropObservation, withScore = false)

  /** Embedding near-duplicate CLUSTERS: hyperplane-LSH banded candidate
    * generation with fused cosine verify, resolved to connected
    * components — each member labeled with its cluster's minimum id.
    * Output: (id, canonical_id) for every id that appears in any
    * verified pair.
    *
    * Shape (r17, measured both ways): the cluster consumer skips the
    * pair operator's score projection, so the cross-band distinct
    * exchange carries bare (id_a, id_b) rows — a third less payload
    * than [[embeddingNearDuplicates]]`.select(ids)`, whose projection
    * Catalyst cannot push below the distinct. The distinct itself
    * STAYS: handing the raw verified multiset straight to the
    * clustering measured 146 s vs 78 s composed at the 1M-vector point
    * — at adaptive widths the multiset is ~bands (~20x) larger than the
    * pair set, and the clustering's eager edge materialization pays
    * that 20x in block-manager writes where the distinct pays one
    * compressed shuffle. Reduce-early wins; law-pinned == composed
    * pairs->clusters. */
  def embeddingClusters(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double,
      numBits: Int = 0, numBands: Int = 4,
      maxBucketSize: Int = 100000,
      dropObservation: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    DedupFunctions.duplicateClusters(embeddingNearDuplicateMultiset(
      df, idCol, vecCol, dim, threshold, numBits, numBands,
      maxBucketSize, dropObservation)
      .dropDuplicates("id_a", "id_b"))

  private def embeddingVerifiedPairs(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double,
      numBits: Int, numBands: Int,
      maxBucketSize: Int,
      dropObservation: Option[org.apache.spark.sql.Observation],
      withScore: Boolean): DataFrame = {
    // Explicit numBits pins (rows, bands) exactly; the auto path derives
    // rows from the corpus count and grows BANDS with the key width so
    // the true-pair catch rate holds as the corpus scales (adaptiveBands
    // scaladoc; every gate corpus derives rows <= 16 -> 4 bands, where
    // the per-band keys are bit-identical to the old packed-long slices).
    // The auto path MATERIALIZES the (id, vec) projection (same
    // discipline as semanticDedup's members): the width needs a count
    // anyway, and without the checkpoint the count, the signature branch
    // and the two verify sides each re-scan the source — or re-execute a
    // computed upstream pipeline — four times.
    val base0 = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // lazy (r20): the width-deriving count below is the first action and
    // materializes the projection in the same job
    val base = if (numBits > 0) base0 else base0.localCheckpoint(false)
    val (rows, bands) =
      if (numBits > 0) (numBits / numBands, numBands)
      else {
        val r = adaptiveRows(base.count())
        (r, adaptiveBands(r, numBands))
      }
    // PlanBarrier: posexplode over a UDF column would otherwise let the
    // optimizer re-evaluate the signature kernel in both the Generate
    // and its input Project (PlanAuditSpec gates the duplication class).
    // `vec` rides through the fence so the bucket self-join below can
    // verify in place (one row ser/deser per doc — noise next to the
    // exchange it saves).
    val withKeys = graft.util.PlanBarrier.fence(
      base.select(col("id"), col("vec"),
        lshBandKeys(col("vec"), dim, rows, bands).as("keys")))
    val banded = withKeys.select(col("id"), col("vec"),
      posexplode(col("keys")).as(Seq("band", "key")))
    // Bounded buckets (same guard as the minhash/simhash generators): one
    // hot LSH bucket would otherwise land every member in a single
    // collect_list buffer row and expand O(B^2) pairs. Dropped buckets
    // are observable via `dropObservation` (dropped_buckets/max_bucket).
    val grouped = banded
      .groupBy(col("band"), col("key"))
      .agg(collect_list(col("id")).as("ids"))
    val observed = dropObservation.fold(grouped)(o => grouped.observe(o,
      sum(when(size(col("ids")) > maxBucketSize, 1L).otherwise(0L)).as("dropped_buckets"),
      coalesce(max(size(col("ids"))), lit(0)).as("max_bucket")))
    // Fused verify (r17, the semanticDedup fix applied to the banded
    // generator): pairs come from a (band, key)-keyed SELF-JOIN of the
    // banded (id, vec) rows with the cosine verify fused into the join
    // stage, and the cross-band dedup runs on VERIFIED bare-id pairs.
    // The r16 formulation deduped bare-id candidates first and joined
    // vectors back by id — at the 4M-vector point that dragged a
    // dim-sized vector per candidate row through an id-keyed sort-merge
    // join, overflowing the node's scratch disk before finishing; here
    // vectors cross only the bands-x-corpus bucket exchange (~8 GB at
    // 4M) and every downstream exchange is bare ids + score. The trade:
    // a pair colliding in several bands pays one cosine per collision
    // instead of one per pair — flops for exchange volume.
    // shuffle_hash throughout: the PlanBarrier fence hides size stats, so
    // Catalyst would otherwise sort-merge these — a sort of the
    // vector-bearing banded stream per join side, pure fixed cost at gate
    // scale and a second sort pass at 4M.
    val sized = observed
      .where(size(col("ids")).between(2, maxBucketSize))
      .select(col("band"), col("key"))
    val compared = banded.join(sized.hint("shuffle_hash"), Seq("band", "key"))
    val verified = compared
      .select(col("band"), col("key"), col("id").as("id_a"), col("vec").as("vec_a"))
      .join(compared
        .select(col("band"), col("key"), col("id").as("id_b"), col("vec").as("vec_b"))
        .hint("shuffle_hash"),
        Seq("band", "key"))
      .where(col("id_a") < col("id_b") &&
        cosine(col("vec_a"), col("vec_b")) >= threshold)
    if (withScore)
      verified.select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("score"))
    else verified.select(col("id_a"), col("id_b"))
  }

  /** SemDeDup-style semantic deduplication ("SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", Abbas et al.
    * 2023): partition the embedding space into cells, and within each
    * cell drop every vector that has a near-duplicate (cosine >=
    * `simThreshold`) which is FARTHER from the cell centroid — the
    * paper's keep-the-least-central policy (edge examples carry more
    * signal than cluster cores), made deterministic with an id tiebreak.
    *
    * Cells come from the deterministic hyperplane signature rather than
    * the paper's k-means: O(1) per vector, no iterative fitting, and
    * reproducible across engines (the catalog oracle rebuilds the same
    * cells in SQL). Centroids are computed by a posexplode/(cell, pos)
    * aggregation — a `dim`-fold but values-only shuffle — and rounded to
    * 6 decimals so the float-reduction order of avg() can never leak
    * into the keep/drop comparisons; the per-cell centroid table is at
    * most 2^numBits rows and broadcasts. In-cell pair expansion reuses
    * the bounded-bucket discipline of [[embeddingNearDuplicates]]:
    * vectors join back only for in-cell candidate pairs, never into the
    * candidate shuffle itself. Scale knob: raise `numBits` with corpus
    * size (cells ~ n / expected cell population).
    *
    * @return kept rows only: (id, cell, centroid_sim)
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numBits: Int = 8, simThreshold: Double = 0.8,
      maxCellSize: Int = 100000,
      dropObservation: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // Eagerly materialized (same discipline as [[minhashNearDuplicates]]):
    // five downstream branches consume (id, vec, cell); without this the
    // signature UDF would re-project per branch.
    val members = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshSignature(col(vecCol), dim, numBits).as("cell"))
      // lazy (r20): all five branches live in the consumer's plan; the
      // first action (typically the centroid broadcast build) materializes
      // the blocks — concurrent block computes dedup via the block manager
      .localCheckpoint(false)
    // Centroids as ONE cell-keyed hash aggregate with `dim` avg columns
    // (all built-in, codegen, map-side combinable): the previous
    // posexplode/(cell, pos) formulation shuffled a dim-fold row stream
    // (~55M rows at the 1M-vector point); this shuffles one partial row
    // per (cell x partition). Same values averaged, order-insensitive
    // after the 6-decimal round (the tolerance the cross-engine oracle
    // already relies on). Fenced: downstream dot() and l2Norm() both
    // consume cvec, and without the barrier CollapseProject would inline
    // the array assembly into each of them (the PlanAuditSpec duplicate
    // gate catches exactly this).
    val cent = graft.util.PlanBarrier.fence {
      val avgs = (0 until dim).map(i =>
        avg(col("vec")(i).cast("double")).as(s"__c$i"))
      members.groupBy(col("cell"))
        .agg(avgs.head, avgs.tail: _*)
        .select(col("cell"),
          array((0 until dim).map(i => round(col(s"__c$i"), 6)): _*).as("cvec"))
    }
    // Centroid table size is 2^numBits rows x dim doubles: broadcast
    // while that is clearly executor-safe (<= 2^14 cells * 64 dims ~ 8
    // MB), otherwise fall back to a shuffle join on the cell key — the
    // corpus side shuffles (id, vec, cell) once either way.
    val centSide = if (numBits <= 14) broadcast(cent) else cent
    // Also materialized: three consumers (the kept output, and the two
    // sides of the dominance join) would otherwise each replay the
    // centroid aggregation and the cosine fold.
    val withSim = members.join(centSide, Seq("cell"))
      .select(col("id"), col("cell"),
        round(dot(col("vec"), col("cvec")) /
          (l2Norm(col("vec")) * l2Norm(col("cvec"))), 6).as("centroid_sim"))
      .localCheckpoint(false) // lazy (r20): same job-fusion argument as members
    // Cells larger than maxCellSize are skipped ENTIRELY (all members
    // kept, none compared) — a recall loss, so it is observable the same
    // way the other bounded-bucket generators report theirs: singleton
    // cells (size < 2) are NOT drops, they simply have nothing to compare.
    val cells = members.groupBy(col("cell"))
      .agg(collect_list(col("id")).as("ids"))
    val observedCells = dropObservation.fold(cells)(o => cells.observe(o,
      sum(when(size(col("ids")) > maxCellSize, 1L).otherwise(0L)).as("dropped_buckets"),
      coalesce(max(size(col("ids"))), lit(0)).as("max_bucket")))
    // UNDIRECTED pair expansion (id_a < id_b): the keep-least-central
    // rule drops exactly one member of every verified pair — the MORE
    // central one (higher centroid_sim; ties drop the higher id) — so
    // one row per pair decides the drop directly. Half the cosine
    // verifies and half the sim-join lookups of the directed (a != b)
    // formulation, for the identical dropped set.
    //
    // Pairs come from a cell-keyed SELF-JOIN of the (id, vec, cell)
    // checkpoint with the cosine verify FUSED into the join as a
    // post-condition, so vectors cross two corpus-sized cell exchanges
    // and the verified output is bare id pairs. The r16 formulation
    // exploded bare-id pairs first and joined vectors back BY ID — after
    // the id_a join every candidate row dragged a dim-sized vector
    // through the id_b sort-merge join (~136 GB sorted at the 4M-vector
    // point; measured 8.3x wall for 4x data — the 2000x instrument's
    // catch, r17). Cells to compare are the [2, maxCellSize] sizes off
    // the SAME observed aggregate, so the drop observation still fires.
    // shuffle_hash (same rationale as embeddingNearDuplicates): the
    // checkpoint hides size stats, so Catalyst would sort-merge these and
    // pay a sort of the vector-bearing member stream per join side.
    val sized = observedCells
      .where(size(col("ids")).between(2, maxCellSize))
      .select(col("cell"))
    val compared = members.join(sized.hint("shuffle_hash"), Seq("cell"))
    val neighbors = compared
      .select(col("cell"), col("id").as("id_a"), col("vec").as("vec_a"))
      .join(compared
        .select(col("cell"), col("id").as("id_b"), col("vec").as("vec_b"))
        .hint("shuffle_hash"),
        Seq("cell"))
      .where(col("id_a") < col("id_b") &&
        cosine(col("vec_a"), col("vec_b")) >= simThreshold)
      .select(col("id_a"), col("id_b"))
    val simA = withSim.select(col("id").as("id_a"), col("centroid_sim").as("sim_a"))
    val simB = withSim.select(col("id").as("id_b"), col("centroid_sim").as("sim_b"))
    val dropped = neighbors.join(simA, Seq("id_a")).join(simB, Seq("id_b"))
      .select(when(col("sim_a") > col("sim_b") ||
          (col("sim_a") === col("sim_b") && col("id_a") > col("id_b")),
        col("id_a")).otherwise(col("id_b")).as("id"))
      .distinct()
    withSim.join(dropped, Seq("id"), "left_anti")
  }
}
