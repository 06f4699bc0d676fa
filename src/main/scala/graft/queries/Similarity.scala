package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.queries.Relational.Q

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float], dim 64).
  *
  * - `q_knn_brute` is the exact baseline: the query vector is broadcast as
  *   a 1-row literal, the scan computes one in-row zip_with/aggregate dot
  *   product per candidate (whole-stage codegen, no explode), and a tiny
  *   top-k shuffle finishes. Distributed cost is O(N·d) map-side — at
  *   100 TB this is a single pass with no join blow-up.
  * - `q_knn_ivf` is the scale path: a coarse quantizer (here the `label`
  *   column as the cell id; k-means centroids in a real pipeline) maps the
  *   query to its nearest cell and only that cell is scanned — the classic
  *   IVF probe-1 trade: ~1/|cells| of the data touched. Centroid
  *   construction is the only exploded (per-dimension) aggregation, and it
  *   is O(cells·d), not O(N·d).
  *
  * Determinism: all dot products/norms fold per-dimension products through
  * exact decimal addition (see Vec), so Spark's fold order and DuckDB's
  * explode+GROUP BY SUM agree bit-for-bit; the final cosine is a fixed
  * sequence of IEEE double ops on identical inputs.
  */
object Similarity {

  private def dec(c: Column): Column = c.cast(DecimalType(25, 10))

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "embeddings").select(col("vec_id"), col("label"), col("embedding"))

  /** 1-row DataFrame with the query vector (vec_id = 0) and its norm. */
  private def queryVec(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), Vec.norm2(col("embedding")).as("qn2"))

  /** IVF coarse index: per-cell centroids (label, i, c), built ONCE per
    * corpus (keyed by its directory — the corpus version) and persisted.
    * A real pipeline would store this as a catalog table refreshed on
    * ingest; rebuilding it inside every query execution is the
    * anti-pattern this cache removes. O(cells·d) rows — tiny. */
  // keyed by (session, dir): a cached DataFrame is bound to the session
  // that built it — handing it to a different (possibly stopped) session
  // is the cross-session cache-contamination trap
  private val centroids = GateCache.frame()

  // the PQ pipeline's persisted quantized vectors and its memoized coded
  // result, one per (session, corpus): two gates share one training run
  // (rebuilding a trained index inside every query execution is the
  // anti-pattern the centroids cache above documents); stopped-session
  // entries are swept on access (the shared GateCache discipline)
  private val pqCaches = GateCache.frame()
  private val pqCoded = GateCache.frame()
  // q_emb_kmeans' persisted quantized corpus — one retained generation on
  // the quantized (vec_id, v) frame behind quantizedFrame — memoized per
  // (session, corpus) via getOrBuild and shared by q_emb_kmeans and
  // q_emb_kcenter; stopped-session sweep on every access
  private val kmCaches = GateCache.frame()

  /** Product-quantization train + encode + ADC, shared by `q_emb_pq` and
    * `q_knn_ivfpq`: the 64-dim floor(x·64+½)-quantized vector splits into
    * M=4 subspaces of L=16 dims; each subspace trains a K=8 codebook with
    * one integer-Lloyd step (the q_emb_kmeans discipline — M bounded
    * collect-syncs of O(K·L) longs); every vector encodes as M codes; and
    * the query's (vec_id 0) exact subspace distance to every codeword
    * precomputes into an M×K literal so the returned frame's `adc_dist`
    * is a codes-only lookup sum (Asymmetric Distance Computation — the
    * search never touches a vector, 4 bytes/vector of working set).
    * Returns (vec_id, label, c0..c3, adc_dist) for every vector.
    * Determinism: code argmin on (distance, j) over integer distances;
    * truncated-mean updates stay in Long (Spark DIV and DuckDB // BOTH
    * truncate toward zero — negative sums occur, so do not "fix" either
    * side to floor division or the codebooks silently diverge); the ADC
    * table is exact Longs. */
  /** Codebook-training sample cap: the N lowest-(md5_60(vec_id), vec_id)
    * vectors. Far above the test corpora (training is exact there) and a
    * hard bound at scale — both engines apply the identical rule. */
  private val pqTrainSample = 1024

  /** PQ geometry DEFAULTS at test-corpus scale: the d-dim quantized
    * vector splits into M subspaces of L=d/M dims, K codewords each —
    * shared by the in-session pipeline and the persisted index's
    * codebooks/codes artifacts. M now DERIVES from the corpus via
    * [[pqSubspaces]] (these constants are the ladder's first rung, which
    * every test corpus sits on); per-INDEX geometry is recovered from
    * the codebooks artifact itself ([[readCodebooksAt]]), so an index
    * built at one rung reads correctly forever. */
  private val pqM = 4; private val pqL = 16; private val pqK = 8
  /** Session-default PQ geometry (M, L) — what an attached-view SQL
    * renderer assumes when the caller doesn't recover the artifact's
    * own geometry. */
  private[graft] def defaultPqGeometry: (Int, Int) = (pqM, pqL)

  /** PQ subspace count derived from corpus size and dimension — the knob
    * follows the corpus the way LSH banding (lshRowsPerBand), Bloom
    * sizing, and sign-cell bits do. Rationale: ADC distance error per
    * vector is the sum of M per-subspace quantization errors over
    * d/M-dim cells; as the corpus (and thus true-neighbor density) grows,
    * candidate separation shrinks, so the code budget (bytes/vector = M)
    * steps up at integer-threshold knees to keep the ADC ranking
    * discriminating — more, narrower subspaces = finer codes. Thresholds
    * are integer comparisons so the oracle derives the IDENTICAL value
    * from count(*) with a CASE (no float logs); the result is clipped to
    * the nearest power-of-two divisor of d (subspaces must tile the
    * vector exactly). */
  private[graft] def pqSubspaces(n: Long, d: Int): Int = {
    val want = if (n < 1048576L) 4 else if (n < 16777216L) 8 else 16
    var m = want
    while (m > 1 && d % m != 0) m /= 2
    m
  }

  /** DuckDB twin of [[pqSubspaces]] for d divisible by 16 (every fixture
    * and any sane embedding width) — expects `n` in scope. */
  private[graft] val pqSubspacesSql =
    "CASE WHEN n < 1048576 THEN 4 WHEN n < 16777216 THEN 8 ELSE 16 END"

  /** The ONE source of the two-stage (centroid probe → codes-only ADC →
    * exact re-rank over ≤50 candidates) kNN SQL that module queries, the
    * plan audit, the soak, and the dev profiler all run — the subspace
    * joins and slice widths derive from [[pqM]]/[[pqL]], so a codebook
    * layout change re-generates every consumer in lockstep.
    *
    * @param table     renders an artifact name ("centroids", "codebooks",
    *                  "codes", "vectors") as SQL relation text (attached
    *                  views or parquet.\`dir\` paths)
    * @param qvecExpr  SQL expression yielding the comma-separated query
    *                  vector TEXT (a literal, or an A7 `$param`)
    * @param limitSql  SQL text for the final LIMIT */
  private[graft] def twoStageKnnSql(table: String => String,
      qvecExpr: String, limitSql: String,
      m: Int = pqM, l: Int = pqL): String = {
    val pqMv = m; val pqLv = l
    val adcSum = (0 until pqMv).map(m => s"a$m.d").mkString(" + ")
    val adcJoins = (0 until pqMv).map(m =>
      s"  JOIN adc a$m ON a$m.m = $m AND a$m.j = k.c$m").mkString("\n")
    // gchk: the in-plan geometry FENCE (the indexed MMR/context-pack
    // discipline, Retrieval.indexedCandCtes). The (m, l) tokens are
    // baked into this SQL at authoring time; a module SQL authored
    // before the index was RETRAINED onto a different pqSubspaces rung
    // (or rendered with the session default against a foreign-geometry
    // index) would otherwise ADC-rank with a wrong subspace mapping —
    // silent recall degradation the exact rerank masks on easy corpora.
    // The one-row assert over the codebooks the plan already reads makes
    // the mismatch a loud runtime error; codebooks is metadata-scale
    // (M×256 rows), so the check is free.
    s"""WITH qv AS (
       |  SELECT transform(split($qvecExpr, ','), x -> CAST(x AS BIGINT)) AS v),
       |gchk AS (
       |  SELECT assert_true(max(b.m) + 1 = $pqMv AND max(size(b.c)) = $pqLv,
       |    'pq geometry mismatch: query authored for (M=$pqMv, L=$pqLv) but ' ||
       |    'the attached index codebooks differ - re-render the named ' ||
       |    'query with the artifact geometry (twoStageKnnSqlFor)') AS ok
       |  FROM ${table("codebooks")} b),
       |probe AS (
       |  SELECT cell FROM (
       |    SELECT c.cell,
       |      aggregate(zip_with(c.c, qv.v, (a, b) -> (a - b) * (a - b)),
       |        0L, (acc, x) -> acc + x) AS cd
       |    FROM ${table("centroids")} c CROSS JOIN qv)
       |  ORDER BY cd, cell LIMIT 1),
       |adc AS (
       |  SELECT b.m, b.j,
       |    aggregate(zip_with(slice(qv.v, b.m * $pqLv + 1, $pqLv), b.c,
       |      (a, x) -> (a - x) * (a - x)), 0L, (acc, x) -> acc + x) AS d
       |  FROM ${table("codebooks")} b CROSS JOIN qv),
       |cand AS (
       |  SELECT k.vec_id, $adcSum AS adc_dist
       |  FROM ${table("codes")} k
       |$adcJoins
       |  CROSS JOIN gchk
       |  WHERE k.cell = (SELECT cell FROM probe) AND gchk.ok IS NULL
       |  ORDER BY adc_dist, vec_id LIMIT 50)
       |SELECT c.vec_id AS vec_id, c.adc_dist AS adc_dist,
       |  aggregate(zip_with(v.v, qv.v, (a, b) -> (a - b) * (a - b)),
       |    0L, (acc, x) -> acc + x) AS exact_dist
       |FROM cand c JOIN ${table("vectors")} v ON v.vec_id = c.vec_id
       |  CROSS JOIN qv
       |ORDER BY exact_dist, vec_id
       |LIMIT $limitSql""".stripMargin
  }

  /** `$qvec`-parameterized single-stage IVF probe over a PERSISTED
    * index: nearest centroid cell by exact integer L2, then exact
    * integer L2 over the LIVE vectors of that cell only (the
    * [[twoStageKnnSql]] probe without the ADC stage — what an index
    * without PQ artifacts answers with, and the delete gate's probe:
    * `table("vectors")` renders tombstone-filtered through
    * [[artifactRelation]], so a committed delete is invisible here by
    * construction). One cell scanned, everything else metadata-sized. */
  private[graft] def ivfIndexProbeSql(table: String => String,
      qvecExpr: String, limitSql: String): String =
    s"""WITH qv AS (
       |  SELECT transform(split($qvecExpr, ','), x -> CAST(x AS BIGINT)) AS v),
       |probe AS (
       |  SELECT cell FROM (
       |    SELECT c.cell,
       |      aggregate(zip_with(c.c, qv.v, (a, b) -> (a - b) * (a - b)),
       |        0L, (acc, x) -> acc + x) AS cd
       |    FROM ${table("centroids")} c CROSS JOIN qv)
       |  ORDER BY cd, cell LIMIT 1)
       |SELECT t.vec_id,
       |  aggregate(zip_with(t.v, qv.v, (a, b) -> (a - b) * (a - b)),
       |    0L, (acc, x) -> acc + x) AS dist
       |FROM ${table("vectors")} t CROSS JOIN qv
       |WHERE t.cell = (SELECT cell FROM probe)
       |ORDER BY dist, vec_id
       |LIMIT $limitSql""".stripMargin

  private def pqAdc(s: SparkSession, dir: String): DataFrame = {
    pqCaches.sweep()
    pqCoded.getOrBuild(s, dir)(pqAdcBuild(s, dir))
  }

  private def pqAdcBuild(s: SparkSession, dir: String): DataFrame = {
    val qv = emb(s, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .persist()
    // qv registers in pqCaches only AFTER the build succeeds (end of this
    // method) — a build that throws must not orphan the persisted frame
    try pqAdcBody(s, dir, qv, pqK)
    catch { case e: Throwable => qv.unpersist(false); throw e }
  }

  /** argmin `(distance, j)` struct of `v`'s m-th L-dim subvector against
    * codebook `bk` — shared by the in-session PQ pipeline, the persisted
    * index build, and the index append/retrain encode passes. */
  private def bestCode(m: Int, L: Int, bk: Array[Seq[Long]]): Column =
    array_min(array(bk.indices.map { j =>
      struct(
        aggregate(zip_with(slice(col("v"), m * L + 1, L), typedlit(bk(j)),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d"),
        lit(j).as("j"))
    }: _*))

  /** Train the M×K codebooks over `(vec_id, …, v)` rows: K seeds from the
    * K lowest vec_ids, then one integer-Lloyd step (truncated-mean DIV
    * update) per subspace. Standard practice (and the 100 TB bound):
    * codebooks TRAIN on a capped deterministic sample — the
    * [[pqTrainSample]] lowest-(md5_60(vec_id), vec_id) vectors, the same
    * rule the oracle CTE applies — and only the ENCODE pass touches the
    * full corpus, so training cost stops growing with corpus size once
    * the cap binds (SCALE.md's q_emb_pq decade curve was ~O(corpus) per
    * Lloyd pass before this). Driver sync is M bounded collects of
    * O(K·L) longs — the q_emb_kmeans discipline. */
  private def trainCodebooks(s: SparkSession, qv: DataFrame,
      M: Int, L: Int, K: Int): Array[Array[Seq[Long]]] = {
    def sub(m: Int): Column = slice(col("v"), m * L + 1, L)
    val first = qv.select(col("vec_id"), col("v"))
      .orderBy("vec_id").limit(K).collect().map(_.getSeq[Long](1))
    val books: Array[Array[Seq[Long]]] =
      Array.tabulate(M)(m => first.map(_.slice(m * L, m * L + L)))
    val samp = qv.select(col("v"),
        graft.functions.VectorExpressions
          .md5_60(s, col("vec_id").cast("string")).as("hh"),
        col("vec_id"))
      .orderBy(col("hh"), col("vec_id")).limit(pqTrainSample)
      .select(col("v")).persist()
    samp.count() // settle: M update passes read the sample
    try {
      for (m <- 0 until M) {
        // codes via the argmin struct, resolved through an aliased select
        // (the q_emb_kmeans discipline) so the (d, j) field names survive
        val upd = samp.select(col("v"), bestCode(m, L, books(m)).as("best"))
          .select(col("v"), col("best.j").as("c"))
          .select(col("c"), posexplode(sub(m)).as(Seq("i", "x")))
          .groupBy("c", "i").agg(expr("sum(x) DIV count(1)").as("cx"))
          .collect()
        val byC = upd.groupBy(_.getInt(0)).map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
        books(m) = Array.tabulate(K)(j => byC.getOrElse(j, books(m)(j)))
      }
    } finally samp.unpersist(false) // training is fully collected above
    books
  }

  private def pqAdcBody(s: SparkSession, dir: String, qv: DataFrame,
      K: Int): DataFrame = {
    val n = qv.count() // settle: M update passes + 2 assignment passes fork the plan
    // geometry follows the corpus (pqSubspaces ladder); at every test
    // corpus size this lands on the (M=4, L=16) rung the DuckDB twin
    // unrolls
    val dims = qv.select(size(col("v"))).head.getInt(0)
    val M = pqSubspaces(n, dims)
    val L = dims / M
    val books = trainCodebooks(s, qv, M, L, K)
    // ADC lookup table: exact distance from the query's subvectors to
    // every codeword — M×K longs, computed once
    val qvec = qv.filter(col("vec_id") === 0).head().getSeq[Long](2)
    val qd: Array[Seq[Long]] = Array.tabulate(M)(m =>
      (0 until K).map(j => books(m)(j).zip(qvec.slice(m * L, m * L + L))
        .map { case (c, x) => (x - c) * (x - c) }.sum))
    val coded = qv.select(col("vec_id") +: col("label") +: col("v") +:
        (0 until M).map(m => bestCode(m, L, books(m)).as(s"b$m")): _*)
      .select(col("vec_id") +: col("label") +:
        (0 until M).map(m => col(s"b$m.j").cast("long").as(s"c$m")): _*)
      .select(col("vec_id") +: col("label") +:
        (0 until M).map(m => col(s"c$m")) :+
        (0 until M).map(m =>
          element_at(typedlit(qd(m)), (col(s"c$m") + 1).cast("int")))
          .reduce(_ + _).as("adc_dist"): _*)
    pqCaches.put(s, dir, qv) // build succeeded: register for lifecycle
    coded
  }

  /** The DuckDB twin of [[pqAdc]]'s training/encoding, CTE for CTE:
    * `q` (quantized vectors), per subspace m the init codebook `b{m}0`,
    * assignment `a{m}`, truncated-mean update `u{m}`, stepped codebook
    * `b{m}1`, final codes `f{m}`, and the query lookup table `qd{m}`. */
  private val pqOracleCtes: String = {
    val M = 4; val L = 16
    def lo(m: Int) = m * L + 1
    def hi(m: Int) = m * L + L
    // per-subspace distance of q.v's m-slice to codebook list c
    def dist(m: Int, vref: String, cref: String) =
      s"list_aggregate(list_transform(generate_series(1, $L), " +
        s"i -> ($vref[${lo(m)} - 1 + i] - $cref[i]) * " +
        s"($vref[${lo(m)} - 1 + i] - $cref[i])), 'sum')"
    val perM = (0 until M).map { m =>
      s"""b${m}0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j,
         |         v[${lo(m)}:${hi(m)}] AS c
         |  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 8)),
         |a$m AS (
         |  SELECT vec_id, j,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
         |  FROM (SELECT q.vec_id, b.j, ${dist(m, "q.v", "b.c")} AS d
         |        FROM qs q CROSS JOIN b${m}0 b)),
         |u$m AS (
         |  SELECT c, i, CAST(sum(x) AS BIGINT) // count(*) AS cx
         |  FROM (SELECT a.j AS c,
         |          generate_subscripts(q.v[${lo(m)}:${hi(m)}], 1) AS i,
         |          unnest(q.v[${lo(m)}:${hi(m)}]) AS x
         |        FROM qs q JOIN (SELECT vec_id, j FROM a$m WHERE rn = 1) a
         |          USING (vec_id))
         |  GROUP BY 1, 2),
         |b${m}1 AS (
         |  SELECT b.j, coalesce(nv.c, b.c) AS c
         |  FROM b${m}0 b LEFT JOIN (SELECT c AS j, list(cx ORDER BY i) AS c
         |                           FROM u$m GROUP BY 1) nv USING (j)),
         |f$m AS (
         |  SELECT vec_id, j AS c$m FROM (
         |    SELECT vec_id, j,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
         |    FROM (SELECT q.vec_id, b.j, ${dist(m, "q.v", "b.c")} AS d
         |          FROM q CROSS JOIN b${m}1 b))
         |  WHERE rn = 1),
         |qd$m AS (
         |  SELECT b.j, ${dist(m, "s.qc", "b.c")} AS d
         |  FROM b${m}1 b CROSS JOIN
         |       (SELECT v AS qc FROM q WHERE vec_id = 0) s)""".stripMargin
    }
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |qs AS (
       |  SELECT vec_id, v FROM (
       |    SELECT vec_id, v,
       |      ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS hh
       |    FROM q ORDER BY hh, vec_id LIMIT $pqTrainSample)),
       |${perM.mkString(",\n")}""".stripMargin
  }
  /** Persisted IVF vector index — the operator-level artifact behind the
    * q_knn_ivf* gates, and what a param-bound kNN named query answers from
    * (RPC `/admin/vector_index_build` → `/admin/vector_index_attach` →
    * A7 `$qvec` binding). Layout — four artifacts in VERSIONED
    * directories named by the root `MANIFEST` file (resolve through
    * [[artifactPath]], never a literal subdir):
    *  - `centroids/`: (cell BIGINT, c ARRAY<BIGINT>) — per-label
    *    truncated-mean centroid over the floor(x·64+½) quantization
    *    (exact Long arithmetic, the emb_outliers discipline)
    *  - `vectors/` partitioned by cell: every vector assigned to its
    *    NEAREST centroid (argmin over (distance, cell) — deterministic),
    *    so a probe reads exactly one partition directory
    *  - `codebooks/`: (m, j, c) — the M×K PQ codebooks, trained on the
    *    bounded [[pqTrainSample]] sample of the corpus
    *  - `codes/` partitioned by cell: (vec_id, c0..c3) — 4 codes/vector,
    *    co-partitioned with `vectors/`, so the ADC stage of a two-stage
    *    probe scans a codes-only fileset (bytes/vector, never the
    *    vectors) and the exact re-rank fetches full vectors only behind
    *    the bounded candidate set
    * Scale shape: driver syncs are the bounded O(cells·d) centroid and
    * O(M·K·L) codebook collects; assignment and encoding are in-row
    * codegen'd projections over the corpus and the writes shuffle
    * nothing (partitionBy on the computed cell). Returns counts. */
  def buildVectorIndex(s: SparkSession, srcDir: String,
      indexDir: String): Map[String, Long] =
    buildVectorIndexM(s, srcDir, indexDir, forceM = None)

  /** [[buildVectorIndex]] with a pinned subspace count — the spec hook
    * that measures the recall cost of a geometry step without a
    * million-vector corpus. Operators use the derived path. */
  private[graft] def buildVectorIndexM(s: SparkSession, srcDir: String,
      indexDir: String,
      forceM: Option[Int]): Map[String, Long] = withIndexWriter(s, indexDir) {
    import org.apache.spark.sql.SaveMode
    java.nio.file.Files.createDirectories(basePath(indexDir))
    // a rebuild over a live index is a maintenance commit like any
    // other: stage every artifact into a fresh versioned generation and
    // flip once — concurrent readers drain on the retained old one
    val vecSnapshot = artifactFiles(indexDir, "vectors")
    val staged = indexArtifacts.map(sub =>
      sub -> nextDirName(indexDir, sub)).toMap
    def stagedPath(sub: String): String = s"$indexDir/${staged(sub)}"
    // persisted: the centroid aggregation, the assignment write, the
    // codebook seed + sample reads all fork this plan — unpinned, the
    // quantized source scan runs four-plus times
    val qv = emb(s, srcDir).select(col("vec_id"),
      col("label").cast("long").as("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .persist()
    try {
    val nVecs = qv.count() // settle before the consumers fork
    // PQ geometry derives from (corpus size, dimension) — the
    // pqSubspaces ladder; the artifact then carries its own geometry
    val dims = qv.select(size(col("v"))).head.getInt(0)
    val geomM = forceM.getOrElse(pqSubspaces(nVecs, dims))
    require(dims % geomM == 0, s"subspaces $geomM do not tile d=$dims")
    val geomL = dims / geomM
    qv.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(expr("sum(x) DIV count(1)").as("cx"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("cx")))),
        p => p.getField("cx")).as("c"))
      .select(col("label").as("cell"), col("c"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(stagedPath("centroids"))
    val cents = readCentroidsAt(s, stagedPath("centroids"))
    val assigned = qv.select(col("vec_id"), col("v"),
        nearestCell(cents).as("b"))
      .select(col("vec_id"), col("v"), col("b.cell").as("cell"))
    assigned.write.partitionBy("cell")
      .mode(SaveMode.Overwrite).parquet(stagedPath("vectors"))
    val books = trainCodebooks(s, qv.select(col("vec_id"), col("v")),
      geomM, geomL, pqK)
    writeCodebooks(s, stagedPath("codebooks"), books)
    // encode from the PERSISTED vectors so codes provably match the
    // on-disk assignment, not a recomputed plan
    val persisted = s.read.parquet(stagedPath("vectors"))
    encodeCodes(persisted, books)
      .write.partitionBy("cell")
      .mode(SaveMode.Overwrite).parquet(stagedPath("codes"))
    // a fresh build starts with an empty tombstone set (the delete
    // artifact — see deleteFromVectorIndex)
    emptyTombstones(s).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(stagedPath("tombstones"))
    commitStaged(s, indexDir, staged, vecSnapshot, kind = "build")
    Map("vectors" ->
        s.read.parquet(artifactPath(indexDir, "vectors")).count(),
      "cells" -> cents.length.toLong,
      "codes" -> s.read.parquet(artifactPath(indexDir, "codes")).count())
    } finally qv.unpersist(false)
  }

  /** argmin `(distance, cell)` struct of `v` against the centroid set. */
  private def nearestCell(cents: Array[(Long, Seq[Long])]): Column =
    array_min(array(cents.toIndexedSeq.map { case (cell, cv) =>
      struct(
        aggregate(zip_with(col("v"), typedlit(cv), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(cell).as("cell"))
    }: _*))

  private def readCentroids(s: SparkSession,
      indexDir: String): Array[(Long, Seq[Long])] =
    readCentroidsAt(s, artifactPath(indexDir, "centroids"))

  private def readCentroidsAt(s: SparkSession,
      path: String): Array[(Long, Seq[Long])] =
    s.read.parquet(path)
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))

  private def readCodebooks(s: SparkSession,
      indexDir: String): Array[Array[Seq[Long]]] =
    readCodebooksAt(s, artifactPath(indexDir, "codebooks"))

  /** Geometry is recovered from the ARTIFACT (M = distinct m, L = code
    * width), not from the session defaults — an index built at a larger
    * corpus rung keeps answering with its own geometry. */
  private def readCodebooksAt(s: SparkSession,
      path: String): Array[Array[Seq[Long]]] = {
    val rows = s.read.parquet(path)
      .orderBy("m", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
    val m = rows.map(_._1).max + 1
    Array.tabulate(m)(mm => rows.filter(_._1 == mm).sortBy(_._2).map(_._3))
  }

  private def writeCodebooks(s: SparkSession, path: String,
      books: Array[Array[Seq[Long]]]): Unit = {
    import s.implicits._
    books.zipWithIndex.flatMap { case (bk, m) =>
      bk.zipWithIndex.map { case (c, j) => (m, j, c) } }.toSeq
      .toDF("m", "j", "c")
      .coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Encode `(vec_id, v, cell)` rows as `(vec_id, c0..cM-1, cell)` — the
    * geometry comes from the books themselves, never the session
    * defaults. */
  private def encodeCodes(vecs: DataFrame,
      books: Array[Array[Seq[Long]]]): DataFrame = {
    val m = books.length
    val l = books(0)(0).length
    vecs
      .select(col("vec_id") +: col("cell").cast("long").as("cell") +:
        (0 until m).map(mm => bestCode(mm, l, books(mm)).as(s"b$mm")): _*)
      .select(col("vec_id") +:
        (0 until m).map(mm => col(s"b$mm.j").cast("long").as(s"c$mm")) :+
        col("cell"): _*)
  }

  /** Append an increment of vectors (an embeddings-schema parquet dir) to
    * a persisted index: quantize, assign each vector to its nearest
    * EXISTING centroid (the same argmin as the build — centroids are
    * never retrained here, the dedup-index append discipline: O(increment)
    * work, the corpus of record never re-read), and append into the
    * cell-partitioned layout. Returns the appended count. */
  def appendVectorIndex(s: SparkSession, srcDir: String,
      indexDir: String): Long =
    appendVectorIndexDf(s, s.read.parquet(srcDir), indexDir)

  /** DataFrame-source variant of [[appendVectorIndex]] — what the
    * streaming ingest path feeds per micro-batch. Codes append through
    * the PERSISTED codebooks (never retrained here — the same
    * O(increment) discipline as the centroid assignment; a pre-codes
    * index without `codebooks/` appends vectors only). */
  def appendVectorIndexDf(s: SparkSession, emb: DataFrame,
      indexDir: String): Long = withIndexWriter(s, indexDir) {
    appendQuantized(s, emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v")),
      indexDir)
  }

  /** Append already-quantized `(vec_id, v)` rows: assign to the CURRENT
    * centroids, land in the cell layout, encode through the persisted
    * codebooks. Callers hold the index writer lock. */
  private def appendQuantized(s: SparkSession, inc: DataFrame,
      indexDir: String): Long = {
    import org.apache.spark.sql.SaveMode
    // one manifest snapshot: centroid read, vectors write, codebook read
    // and codes write must all land in the SAME generation — per-artifact
    // resolution could straddle an out-of-process commit flip and append
    // vectors to the new generation but codes to the retained old one
    val snap = resolveAll(indexDir)
    val cents = readCentroidsAt(s, snap("centroids"))
    require(cents.nonEmpty, s"no centroids at $indexDir — build first")
    // delete-wins: a tombstoned vec_id never re-ingests — its rows would
    // occupy bytes and candidate slots while artifactRelation's anti-join
    // hides them from every probe, and the next compaction would purge
    // them again (resurrection requires a rebuild). The guard renders
    // only when the delete set is actually non-empty.
    val tomb = tombstonesDf(s, snap("tombstones"))
    val incLive = if (tomb.isEmpty) inc
      else inc.join(tomb, Seq("vec_id"), "left_anti")
    val assigned = incLive.select(col("vec_id"), col("v"),
        nearestCell(cents).as("b"))
      .select(col("vec_id"), col("v"), col("b.cell").as("cell"))
      .persist() // settle: the vectors write and the codes encode both read it
    try {
      assigned.write.partitionBy("cell")
        .mode(SaveMode.Append).parquet(snap("vectors"))
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
          snap("codebooks").stripPrefix("file:")))) {
        encodeCodes(assigned, readCodebooksAt(s, snap("codebooks")))
          .write.partitionBy("cell")
          .mode(SaveMode.Append).parquet(snap("codes"))
      }
      assigned.count()
    } finally assigned.unpersist(false)
  }

  // ---------------- targeted deletion (tombstones) ----------------
  //
  // The right-to-be-forgotten verb of the index lifecycle (takedowns,
  // opt-outs, contamination removal). A delete is LOGICAL and
  // O(deleted): the new ids merge into the tombstones artifact, staged
  // as a fresh generation and committed through the same one-pointer
  // manifest flip as every other maintenance write — no vector or codes
  // bytes move, so deleting 10 documents from a 100 TB index costs a
  // metadata-sized commit. Every read path resolves "live" vectors and
  // codes through [[artifactRelation]]'s anti-join, so a committed
  // delete is immediately invisible to probes; the PHYSICAL purge
  // amortizes into the next compaction or retrain (the lakehouse
  // delete-file discipline), which rewrites without the tombstoned rows
  // and resets the set to empty.

  private def emptyTombstones(s: SparkSession): DataFrame = {
    import s.implicits._
    s.emptyDataset[Long].toDF("vec_id")
  }

  /** The tombstone id set at `path` — empty for an index that predates
    * the artifact (every path tolerates absence, so a legacy index
    * keeps answering). */
  private def tombstonesDf(s: SparkSession, path: String): DataFrame =
    if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(path.stripPrefix("file:"))))
      s.read.parquet(path).select(col("vec_id"))
    else emptyTombstones(s)

  /** Tombstone `ids` out of a persisted index (Seq convenience — the RPC
    * shape). See [[deleteFromVectorIndexDf]]. */
  def deleteFromVectorIndex(s: SparkSession, ids: Seq[Long],
      indexDir: String): Map[String, Long] = {
    import s.implicits._
    deleteFromVectorIndexDf(s, ids.toDF("vec_id"), indexDir)
  }

  /** Tombstone every id in `ids` (a 1-column `vec_id` frame) out of a
    * persisted index: ids are bounded to those actually present (a
    * delete of an absent id is a no-op, so retries are idempotent),
    * merged with the current tombstone set, and committed as a fresh
    * tombstones generation in ONE atomic manifest flip. O(deleted) work;
    * probes exclude the set immediately; compaction/retrain purge it
    * physically. Returns the post-commit tombstone count. */
  def deleteFromVectorIndexDf(s: SparkSession, ids: DataFrame,
      indexDir: String): Map[String, Long] = withIndexWriter(s, indexDir) {
    import org.apache.spark.sql.SaveMode
    val snap = resolveAll(indexDir)
    val vecSnapshot = artifactFiles(indexDir, "vectors")
    val present = ids.select(col("vec_id").cast("long").as("vec_id"))
      .distinct()
      .join(s.read.parquet(snap("vectors")).select("vec_id"),
        Seq("vec_id"), "left_semi")
    val merged = tombstonesDf(s, snap("tombstones"))
      .union(present).distinct()
    val next = nextDirName(indexDir, "tombstones")
    // the set is bounded by deletes-per-maintenance-cycle (every
    // compaction drains it), so one file keeps the probe-side anti-join
    // a trivially broadcast scan
    merged.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/$next")
    commitStaged(s, indexDir, Map("tombstones" -> next), vecSnapshot,
      kind = "delete")
    Map("tombstones" ->
      s.read.parquet(artifactPath(indexDir, "tombstones")).count())
  }

  /** Does the index carry this artifact? (manifest-resolved; a legacy
    * flat layout resolves against its plain directories). */
  private def subdirExists(indexDir: String, sub: String): Boolean =
    java.nio.file.Files.isDirectory(
      basePath(indexDir).resolve(currentName(indexDir, sub)))

  /** Operational state of a persisted index: totals plus the CELL-SKEW
    * signal — the largest cell's share of the corpus. A probe scans one
    * cell, so a hot cell IS the query cost at scale; when the share drifts
    * far above 1/cells the operator answer is retrain/re-split (the
    * vector-side sibling of the dedup index's `stale` re-band signal). */
  def vectorIndexInfo(s: SparkSession, indexDir: String): Map[String, Long] = {
    // one manifest snapshot for the whole logical read: the vectors scan
    // and both file counts must describe the SAME generation even if a
    // maintenance commit flips mid-info
    val snap = resolveAll(indexDir)
    val counts = s.read.parquet(snap("vectors"))
      .groupBy("cell").count().collect().map(_.getLong(1))
    val total = counts.sum
    def files(sub: String): Long =
      listParquet(java.nio.file.Paths.get(
        snap(sub).stripPrefix("file:"))).size.toLong
    // the purge signal: tombstoned rows still occupy bytes and candidate
    // slots until the next compaction drains them — share drift is what
    // tells the maintenance tick to compact early
    val tombs = tombstonesDf(s, snap("tombstones")).count()
    Map(
      "vectors" -> total,
      "tombstones" -> tombs,
      "live" -> (total - tombs),
      "cells" -> counts.length.toLong,
      "max_cell" -> (if (counts.isEmpty) 0L else counts.max),
      "max_cell_share_pct" ->
        (if (total == 0) 0L else counts.max * 100 / total),
      // the small-files signal: every append adds ≥1 file per touched
      // cell, so a long-lived index degrades the way the event log does —
      // this count is what tells the operator to compact
      "files" -> (files("vectors") + files("codes")))
  }

  private def deleteDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally st.close()
    }

  // ---------------- versioned-artifact manifest ----------------
  //
  // The index's artifacts live in VERSIONED directories (`vectors.v3`)
  // named by a single MANIFEST file at the index root; every reader
  // resolves through the manifest, and every maintenance commit is ONE
  // atomic rename of a freshly written manifest (the event log's
  // compactLog catalog-location flip, applied to all four artifacts at
  // once). Consequences, by construction:
  //   - a reader can never see a mixed generation: the manifest names a
  //     complete, internally consistent artifact set before AND after
  //     the flip, and POSIX rename makes the flip itself atomic;
  //   - a reader can never hit path-not-found mid-maintenance: the
  //     previous generation's directories are RETAINED until the NEXT
  //     commit (compactLog's one-retained-version snapshot isolation),
  //     so a query planned against pre-flip paths scans a complete,
  //     merely stale, index;
  //   - a crash while staging leaves only unreferenced garbage
  //     directories (swept at the next write entry) — there is no
  //     partially renamed state to repair.
  // On a cluster object store the manifest flip is the same one-pointer
  // conditional-put this file implements with rename.

  private val indexArtifacts =
    Seq("centroids", "vectors", "codebooks", "codes", "tombstones")
  /** The artifact names (spec access). */
  private[graft] def indexArtifactNames: Seq[String] = indexArtifacts

  private val manifestHeader = "vector-index-manifest v1"

  private def basePath(indexDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(indexDir.stripPrefix("file:"))

  private def manifestFile(indexDir: String): java.nio.file.Path =
    basePath(indexDir).resolve("MANIFEST")

  // the manifest commits through the pluggable pointer primitive (POSIX
  // rename by default; versioned conditional-put for object stores where
  // rename is copy+delete — see PointerCommit)
  private lazy val hconf = new org.apache.hadoop.conf.Configuration()
  private def manifestIo(indexDir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(manifestFile(indexDir).toString)
    // RAW local fs: the index dir is local by construction (basePath), and
    // the checksummed LocalFileSystem's .crc sidecars would poison reads
    // after any out-of-band manifest write (crash-recovery fixtures,
    // operator intervention) — the manifest body is self-validating anyway
    (org.apache.hadoop.fs.FileSystem.getLocal(hconf).getRaw, hp)
  }

  /** Current mapping `sub -> (currentDirName, previousDirName?)`. An
    * index without a MANIFEST (built by hand, or pre-manifest) resolves
    * each artifact to its flat legacy directory. */
  private def manifestMapping(
      indexDir: String): Map[String, (String, Option[String])] = {
    val (fs, hp) = manifestIo(indexDir)
    graft.stream.PointerCommit.default.readCurrent(fs, hp) match {
      case Some(raw) =>
        val lines = new String(raw,
          java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toVector
        require(lines.nonEmpty && lines.head == manifestHeader,
          s"unreadable index manifest at $hp")
        lines.drop(1).filter(_.nonEmpty).map { l =>
          val parts = l.split(" ")
          require(parts.length == 3, s"bad manifest line: $l")
          parts(0) -> (parts(1), if (parts(2) == "-") None else Some(parts(2)))
        }.toMap
      case None => indexArtifacts.filter(sub => java.nio.file.Files.isDirectory(
        basePath(indexDir).resolve(sub))).map(sub => sub -> (sub, None)).toMap
    }
  }

  /** An artifact's CURRENT directory name (manifest-resolved; a flat
    * legacy layout resolves to `sub` itself). */
  private def currentName(indexDir: String, sub: String): String =
    manifestMapping(indexDir).get(sub).map(_._1).getOrElse(sub)

  /** Resolve an artifact's CURRENT directory path — the one read hook
    * every SINGLE-artifact consumer goes through. A consumer touching
    * MORE THAN ONE artifact in one logical read must resolve them all
    * from ONE [[resolveAll]] snapshot instead: per-artifact calls each
    * re-read the manifest and can straddle a concurrent commit flip,
    * silently mixing generations (e.g. new centroids over retained old
    * vectors). */
  private[graft] def artifactPath(indexDir: String, sub: String): String =
    s"$indexDir/${currentName(indexDir, sub)}"

  /** ONE manifest read → every artifact's current path. The snapshot a
    * multi-artifact logical read (attach views, info, append, the
    * two-stage SQL renderer) resolves all its paths from, so the set is
    * internally consistent even if a commit flips mid-read — the reader
    * then sees one complete generation (possibly the retained previous
    * one), never a mix. */
  private[graft] def resolveAll(indexDir: String): Map[String, String] = {
    val m = manifestMapping(indexDir)
    indexArtifacts.map(sub =>
      sub -> s"$indexDir/${m.get(sub).map(_._1).getOrElse(sub)}").toMap
  }

  /** SQL relation renderer over ONE [[resolveAll]] snapshot — the `table`
    * argument [[twoStageKnnSql]] consumers pass when querying parquet
    * directly instead of attached views. All relations render from the
    * same manifest generation by construction. This is THE live-rows
    * seam: when the snapshot carries a tombstones artifact, the
    * `vectors` and `codes` relations render as anti-joined subqueries —
    * one place implements "deleted rows are invisible" for every SQL
    * consumer at once (two-stage kNN, MMR, context packing, attached
    * views). Unaliased on purpose: every call site appends its own
    * alias. */
  private[graft] def artifactRelation(indexDir: String): String => String =
    relationFrom(resolveAll(indexDir))

  private def relationFrom(snap: Map[String, String]): String => String = {
    val tomb = snap.get("tombstones").filter(p =>
      java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(p.stripPrefix("file:"))))
    sub =>
      if ((sub == "vectors" || sub == "codes") && tomb.isDefined)
        s"(SELECT g.* FROM parquet.`${snap(sub)}` g LEFT ANTI JOIN " +
          s"parquet.`${tomb.get}` gt ON g.vec_id = gt.vec_id)"
      else s"parquet.`${snap(sub)}`"
  }

  /** One manifest snapshot for the attach path: the artifact PATHS (for
    * existence/geometry checks) plus the matching relation renderer —
    * both from the SAME generation, so an attach can never mix. */
  private[graft] def attachSnapshot(
      indexDir: String): (Map[String, String], String => String) = {
    val snap = resolveAll(indexDir)
    (snap, relationFrom(snap))
  }

  /** The codes artifact's code-column names, derived from [[pqM]] so a
    * PQ geometry change regenerates every consumer (attach views
    * included) in lockstep. */
  private[graft] def codeCols: Seq[String] = (0 until pqM).map(m => s"c$m")

  /** A PERSISTED index's code columns, recovered from its codebooks
    * artifact — an index built at a larger corpus rung attaches with its
    * own geometry, not the session default. */
  private[graft] def codeColsAt(s: SparkSession,
      codebooksPath: String): Seq[String] = {
    val m = s.read.parquet(codebooksPath)
      .agg(max(col("m"))).head.getInt(0) + 1
    (0 until m).map(i => s"c$i")
  }

  /** [[twoStageKnnSql]] rendered with a PERSISTED index's own geometry
    * (recovered from its codebooks artifact through one manifest
    * snapshot). */
  private[graft] def twoStageKnnSqlFor(s: SparkSession, indexDir: String,
      table: String => String, qvecExpr: String, limitSql: String): String = {
    val (m, l) = pqGeometryAt(s, indexDir)
    twoStageKnnSql(table, qvecExpr, limitSql, m, l)
  }

  /** A PERSISTED index's PQ geometry (M, L), recovered from its
    * codebooks artifact through ONE manifest snapshot — what every
    * serving renderer (two-stage kNN, indexed MMR, context pack) must
    * author with: an index built past a [[pqSubspaces]] knee, or
    * retrained onto one, answers with its OWN geometry, never the
    * session ladder's first rung. */
  private[graft] def pqGeometryAt(s: SparkSession,
      indexDir: String): (Int, Int) = {
    val books = readCodebooksAt(s, resolveAll(indexDir)("codebooks"))
    (books.length, books(0)(0).length)
  }

  /** The staging name for `sub`'s next generation: bump the version of
    * the current directory name (a flat legacy name is generation 0). */
  private def nextDirName(indexDir: String, sub: String): String = {
    val cur = currentName(indexDir, sub)
    val v = if (cur == sub) 0 else cur.stripPrefix(s"$sub.v").toInt
    s"$sub.v${v + 1}"
  }

  private def writeManifest(indexDir: String,
      m: Map[String, (String, Option[String])]): Unit = {
    val body = (manifestHeader +: m.toSeq.sortBy(_._1).map {
      case (sub, (cur, prev)) => s"$sub $cur ${prev.getOrElse("-")}"
    }).mkString("\n")
    val (fs, hp) = manifestIo(indexDir)
    graft.stream.PointerCommit.default.publish(fs, hp,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The atomic commit: flip the updated artifacts to their staged
    * directories in ONE manifest rename. Each updated artifact's
    * displaced current becomes its retained `prev` (one version of
    * snapshot isolation for in-flight readers); the displaced
    * prev-of-prev — which has had a full maintenance cycle for readers
    * to drain — is deleted. After the flip, the commit appends one
    * line to the HISTORY log (see [[manifestHistory]]) — observability
    * metadata written OUTSIDE the atomic step on purpose: a crash
    * between flip and history append loses one history line, never
    * index consistency. */
  private def commitManifest(indexDir: String,
      updates: Map[String, String], kind: String = "commit"): Unit = {
    val m = manifestMapping(indexDir)
    val merged = (m.keySet ++ updates.keySet).map { sub =>
      val (cur, prev) = m.getOrElse(sub, (sub, None))
      updates.get(sub) match {
        case Some(next) => sub -> (next, Some(cur).filter(_ => java.nio.file
          .Files.isDirectory(basePath(indexDir).resolve(cur))))
        case None => sub -> (cur, prev)
      }
    }.toMap
    writeManifest(indexDir, merged)
    // pin the append-mode artifacts' part-file census on the history
    // line: vectors/codes grow IN PLACE between flips, so an as-of read
    // needs to know which files this commit actually covered
    val censuses = Seq("vectors", "codes").flatMap { sub =>
      merged.get(sub).map { case (cur, _) =>
        sub -> listParquet(basePath(indexDir).resolve(cur))
          .map(_.getFileName.toString).toSet
      }
    }.toMap
    appendHistory(indexDir, kind,
      merged.map { case (s, (cur, _)) => s -> cur }, censuses)
    // retention window: the manifest's (cur, prev) pairs PLUS every dir
    // named by the last retainGenerations+1 history snapshots (the new
    // commit + depth priors) — depth 1 reproduces the historical
    // one-displaced-generation rule exactly, deeper keeps more as-of
    // snapshots readable. The sweep walks ALL versioned artifact dirs
    // (not just this flip's displaced prev): at depth > 1 a generation
    // leaves the window several commits after it was displaced, when no
    // manifest entry points at it anymore.
    sweepUnreferenced(indexDir)
  }

  /** Artifact dirs named by the last `retainGenerations + 1` history
    * snapshots — what the retention sweeps must leave on disk. */
  private def retainedHistoryDirs(indexDir: String): Set[String] = {
    val depth = graft.stream.PointerCommit.retainGenerations
    manifestHistory(indexDir).takeRight(depth + 1)
      .flatMap(_._3).collect {
        case (k, v) if indexArtifacts.contains(k) => v
      }.toSet
  }

  // ---------------- commit history + as-of reads ----------------
  //
  // Every manifest commit appends one line to an append-only HISTORY
  // log: `<seq> <kind> sub=curDir ...` — the full post-commit mapping,
  // so each line is a complete, self-contained generation snapshot (the
  // lakehouse snapshot-log idea at pointer-file cost). Retention stays
  // the manifest's: one displaced generation per artifact, so the
  // PREVIOUS commit's snapshot is always readable and older ones decay
  // as their directories are retired — `readable` on each entry says
  // which. An as-of read of a readable snapshot gives time travel one
  // flip back: "what did this index answer before that delete/compact/
  // retrain?" — the audit/debug/rollback-evidence verb.

  private def historyFile(indexDir: String): java.nio.file.Path =
    basePath(indexDir).resolve("HISTORY")

  private def appendHistory(indexDir: String, kind: String,
      mapping: Map[String, String],
      censuses: Map[String, Set[String]] = Map.empty): Unit = {
    val seq = manifestHistory(indexDir).size + 1
    // census pins ride the same line as `census:sub=f1,f2` tokens
    // (parquet part-file names carry no spaces or commas) — see
    // [[resolveAllAsOf]] for why appends force them
    val body = (s"$seq $kind" +:
      (mapping.toSeq.sortBy(_._1).map { case (s, d) => s"$s=$d" } ++
        censuses.toSeq.sortBy(_._1).map { case (s, fs) =>
          s"census:$s=${fs.toSeq.sorted.mkString(",")}" })).mkString(" ")
    // the crc closes the one remaining torn-tail hole: a census list
    // truncated mid-token could otherwise parse as a self-consistent
    // SMALLER census and silently mis-pin an as-of read — with the crc,
    // a torn line drops instead
    val line = body + " crc=" + {
      val c = new java.util.zip.CRC32()
      c.update(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      c.getValue
    }
    // newline-PREFIXED: Files.write APPEND is not atomic — a crash
    // mid-append leaves a torn final line without its newline, and a
    // plain trailing-newline append would concatenate the NEXT entry
    // onto the torn tail, corrupting both. Leading with the newline
    // isolates any torn tail on its own line, where it parse-fails and
    // drops (the one-lost-line crash contract).
    java.nio.file.Files.write(historyFile(indexDir),
      ("\n" + line).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** The commit log: (seq, kind, full artifact mapping) per manifest
    * flip, oldest first. Indexes that predate the log simply have fewer
    * entries; a torn FINAL line (crash mid-append) parse-fails and
    * drops; a gap anywhere earlier refuses loudly — a corrupted line
    * can drop or refuse, never yield a wrong mapping. */
  private[graft] def manifestHistory(
      indexDir: String): Seq[(Int, String, Map[String, String])] = {
    val f = historyFile(indexDir)
    if (!java.nio.file.Files.exists(f)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val parsed = java.nio.file.Files.readAllLines(f).asScala.toSeq
        .filter(_.nonEmpty).flatMap { l =>
          // crc-stamped lines (everything written since the census pins)
          // must verify — a torn or bit-rotted line drops rather than
          // yielding a wrong mapping or a truncated census
          val (body, crcOk) = l.lastIndexOf(" crc=") match {
            // censuses and crcs shipped TOGETHER, so a legacy line can
            // never legitimately carry a census token: a crc-less line
            // containing one is a torn tail truncated exactly before its
            // " crc=" suffix — treat it as torn (drop) rather than let a
            // comma-boundary cut parse as a self-consistent SMALLER
            // census and silently mis-pin an as-of read
            case -1 => (l, !l.contains("census:")) // pre-crc legacy line
            case i =>
              val b = l.substring(0, i)
              val want = l.substring(i + 5).toLongOption
              val c = new java.util.zip.CRC32()
              c.update(b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              (b, want.contains(c.getValue))
          }
          if (!crcOk) None
          else body.split(" ").toSeq match {
            case seq +: kind +: pairs if seq.toIntOption.isDefined &&
                pairs.forall(_.contains("=")) =>
              Some((seq.toInt, kind,
                pairs.flatMap(_.split("=", 2) match {
                  case Array(k, v) => Some(k -> v)
                  case _ => None
                }).toMap))
            case _ => None
          }
        }
      // a torn tail that lost exactly its crc token parses as a legacy
      // line; the post-crash rewrite of the same seq follows it — keep
      // the LAST (complete) line per seq, then insist on contiguity
      val deduped = parsed.zipWithIndex
        .groupBy(_._1._1).toSeq.map(_._2.maxBy(_._2)._1).sortBy(_._1)
      require(deduped.map(_._1) == deduped.indices.map(_ + 1),
        s"HISTORY at $indexDir is corrupted: seqs " +
          s"${deduped.map(_._1).mkString(",")} are not contiguous from 1 " +
          "— restore the file or delete it (history is observability " +
          "metadata; the live index is unaffected)")
      deduped
    }
  }

  /** The artifact-file censuses recorded on history line `seq`
    * (`census:sub -> file set`), empty for pre-census lines. */
  private def historyCensuses(indexDir: String,
      seq: Int): Map[String, Set[String]] =
    manifestHistory(indexDir).find(_._1 == seq).map(_._3).getOrElse(Map.empty)
      .collect { case (k, v) if k.startsWith("census:") =>
        k.stripPrefix("census:") -> v.split(",").filter(_.nonEmpty).toSet
      }

  /** Is every directory of this snapshot still on disk? (census and crc
    * tokens ride the same line map but are not directories) */
  private def snapshotReadable(indexDir: String,
      mapping: Map[String, String]): Boolean =
    mapping.collect {
      case (k, d) if indexArtifacts.contains(k) => d
    }.forall(d =>
      java.nio.file.Files.isDirectory(basePath(indexDir).resolve(d)))

  /** Operator-facing history: one row per commit, newest last, with the
    * readability flag (the retention boundary). */
  def vectorIndexHistory(s: SparkSession,
      indexDir: String): Seq[Map[String, Any]] =
    manifestHistory(indexDir).map { case (seq, kind, mapping) =>
      Map("seq" -> seq.toLong, "kind" -> kind,
        "readable" -> snapshotReadable(indexDir, mapping),
        // artifact dirs only — the census/crc pin tokens ride the same
        // line map but are as-of implementation detail, not operator API
        "artifacts" -> mapping.filter(kv => indexArtifacts.contains(kv._1)))
    }

  /** Resolve the artifact set AS OF commit `seq` — a complete past
    * generation, readable while the manifest's one-cycle retention
    * still holds every directory (always true for the previous commit;
    * loud failure past the boundary, never a silent partial read). */
  private[graft] def resolveAllAsOf(indexDir: String,
      seq: Int): Map[String, String] = {
    val h = manifestHistory(indexDir)
    val entry = h.find(_._1 == seq).getOrElse(
      throw new IllegalArgumentException(
        s"no commit $seq in $indexDir history (${h.size} commits)"))
    require(snapshotReadable(indexDir, entry._3),
      s"commit $seq of $indexDir is past the retention boundary — " +
        "its directories were retired by later commits")
    indexArtifacts.flatMap(sub =>
      entry._3.get(sub).map(d => sub -> s"$indexDir/$d")).toMap
  }

  /** [[artifactRelation]] pinned to the as-of snapshot — time-travel
    * SQL over the retained previous generation (tombstone filtering
    * included, AS OF that commit: a pre-delete snapshot renders its own
    * then-empty tombstone set, so the deleted rows are VISIBLE there —
    * that is the point).
    *
    * CENSUS PINNING: vector appends write in place (parquet Append, no
    * manifest flip), so the vectors/codes DIRECTORIES of a historical
    * commit can hold files appended after it — an unpinned as-of read
    * would be a silent superset, not a snapshot. Each history line
    * records the artifact's part-file census at commit time; when the
    * directory has since grown, the as-of relation filters to exactly
    * the recorded files (input_file_name pin — part-file names are
    * job-UUID unique); a census file MISSING from disk refuses loudly. */
  private[graft] def artifactRelationAsOf(indexDir: String,
      seq: Int): String => String = {
    val snap = resolveAllAsOf(indexDir, seq)
    val base = relationFrom(snap)
    val censuses = historyCensuses(indexDir, seq)
    sub => censuses.get(sub) match {
      case Some(pin) if Seq("vectors", "codes").contains(sub) =>
        val dir = java.nio.file.Paths.get(snap(sub).stripPrefix("file:"))
        val now = listParquet(dir).map(_.getFileName.toString).toSet
        require(pin.subsetOf(now),
          s"commit $seq of $indexDir is past the retention boundary for " +
            s"$sub: ${(pin -- now).size} of its ${pin.size} census files " +
            "were rewritten by later maintenance")
        if (now == pin) base(sub)
        else {
          // the pin renders only when the dir actually grew — the steady
          // state (no appends since the flip) carries no filter at all
          val in = pin.toSeq.sorted.map(f => s"'$f'").mkString(", ")
          val pinned = s"(SELECT * FROM parquet.`${snap(sub)}` WHERE " +
            s"element_at(split(input_file_name(), '/'), -1) IN ($in))"
          // recompose the tombstone seam over the pinned scan
          base(sub).replace(s"parquet.`${snap(sub)}` g", s"$pinned g") match {
            case same if same == base(sub) => pinned
            case wrapped => wrapped
          }
        }
      case _ => base(sub)
    }
  }

  /** Delete artifact directories no manifest entry references — the
    * debris of a crashed staging run. Runs only under the writer lock
    * (a concurrent in-process staging would look unreferenced). */
  private def sweepUnreferenced(indexDir: String): Unit = {
    val base = basePath(indexDir)
    if (!java.nio.file.Files.isDirectory(base)) return
    val live = manifestMapping(indexDir).values
      .flatMap(v => v._1 :: v._2.toList).toSet ++
      retainedHistoryDirs(indexDir)
    val versioned = indexArtifacts.map(sub => s"^$sub(\\.v\\d+)?$$".r)
    val st = java.nio.file.Files.list(base)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector
        .filter(p => java.nio.file.Files.isDirectory(p))
        .map(_.getFileName.toString)
        .filter(n => versioned.exists(_.pattern.matcher(n).matches()))
        .filterNot(live.contains)
        .foreach(n => deleteDir(base.resolve(n)))
    } finally st.close()
  }

  /** Single-writer discipline per index, in-process: appends and
    * maintenance serialize on this lock, so within one driver a
    * maintenance rewrite can never race an append it cannot see — the
    * deployment shape local[*] actually runs. A writer in ANOTHER
    * process is still caught by the fileset detector below (defense in
    * depth); at cluster scale this lock becomes the catalog/manifest
    * commit the event log's compactLog already models. Queries never
    * take it. */
  private def indexLock(indexDir: String): Object =
    WriterLocks.lockFor(indexDir)

  private def listParquet(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!java.nio.file.Files.isDirectory(dir)) Seq.empty
    else {
      val st = java.nio.file.Files.walk(dir)
      try {
        val out = Seq.newBuilder[java.nio.file.Path]
        val it = st.filter(f => f.toString.endsWith(".parquet")).iterator()
        while (it.hasNext) out += it.next()
        out.result()
      } finally st.close()
    }

  /** Parquet files of an artifact's CURRENT generation (manifest-
    * resolved). */
  private def walkParquet(indexDir: String,
      sub: String): Seq[java.nio.file.Path] =
    listParquet(basePath(indexDir).resolve(currentName(indexDir, sub)))

  private def filesIn(dir: java.nio.file.Path): Set[String] =
    listParquet(dir).map(dir.relativize(_).toString).toSet

  /** The current parquet file names of an artifact's live generation —
    * the concurrent-append detector's snapshot: a rewrite computed from
    * a pre-append snapshot must NOT commit over rows that landed
    * mid-rewrite. Maintenance re-lists immediately before the manifest
    * flip and aborts loudly on drift (only reachable from an
    * OUT-of-process writer — in-process writers serialize on
    * [[indexLock]]); an append that completes inside the re-list→flip
    * microwindow is caught by the post-flip salvage in [[commitStaged]]
    * instead (its rows survive in the retained previous generation) —
    * so no interleaving is ever silent. */
  private def artifactFiles(indexDir: String, sub: String): Set[String] =
    filesIn(basePath(indexDir).resolve(currentName(indexDir, sub)))

  private def requireUnchanged(indexDir: String, sub: String,
      snapshot: Set[String], staged: Map[String, String]): Unit = {
    val now = artifactFiles(indexDir, sub)
    if (now != snapshot) {
      staged.values.foreach(d => deleteDir(basePath(indexDir).resolve(d)))
      throw new IllegalStateException(
        s"concurrent append detected in $indexDir/$sub during maintenance " +
          s"(${(now -- snapshot).size} new / ${(snapshot -- now).size} " +
          "removed files) — pause the ingest and re-run")
    }
  }

  // ---------------- the pending-commit marker ----------------
  //
  // Written immediately before the manifest flip, deleted after the
  // post-flip drift salvage. It records the flipped vectors generation
  // (old name, new name) plus the old generation's validated fileset, so
  // a crash between flip and salvage re-enters knowing exactly which
  // files of the RETAINED old directory are drift (an out-of-process
  // append that completed in the re-list→flip microwindow) and replays
  // them through the new generation. A crash BEFORE the flip needs no
  // marker logic at all: nothing was committed, the staged directories
  // are unreferenced garbage, and the next write entry sweeps them.

  private val markerHeader = "index-commit v1"

  private def pendingMarker(indexDir: String): java.nio.file.Path =
    basePath(indexDir).resolve("commit.pending")

  private def writePendingMarker(indexDir: String, oldVectors: String,
      newVectors: String, snapshot: Set[String]): Unit = {
    val body = (Seq(markerHeader, s"old $oldVectors", s"new $newVectors") ++
      snapshot.toSeq.sorted.map(f => s"snap $f")).mkString("\n")
    java.nio.file.Files.write(pendingMarker(indexDir),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Re-append any vectors file of the old generation that is NOT in the
    * validated snapshot — rows an out-of-process appender completed in
    * the re-list→flip microwindow. They re-assign against the NEW
    * centroids and re-encode through the NEW codebooks (their old-
    * generation codes rows are dropped with that generation, by design).
    * At-least-once: a crash mid-salvage replays the whole drift set, and
    * compaction's per-vec_id dedup heals any duplicate rows. */
  private def salvageDrift(s: SparkSession, indexDir: String,
      oldVectorsDir: String, snapshot: Set[String]): Unit = {
    val old = basePath(indexDir).resolve(oldVectorsDir)
    if (!java.nio.file.Files.isDirectory(old)) return
    val drift = (filesIn(old) -- snapshot).toSeq.sorted
    if (drift.nonEmpty)
      appendQuantized(s, s.read.parquet(
          drift.map(r => old.resolve(r).toString): _*)
        .select(col("vec_id"), col("v")), indexDir)
  }

  /** The single-pointer commit every maintenance rewrite goes through:
    * re-list the live vectors fileset against the rewrite's snapshot
    * (abort loudly on out-of-process drift), write the pending marker,
    * flip the manifest atomically, salvage the microwindow, drop the
    * marker. `updates` maps artifact names to their fully staged
    * directory names. */
  private def commitStaged(s: SparkSession, indexDir: String,
      updates: Map[String, String], vecSnapshot: Set[String],
      kind: String = "commit"): Unit = {
    val hadVectors = manifestMapping(indexDir).contains("vectors") ||
      java.nio.file.Files.isDirectory(basePath(indexDir).resolve("vectors"))
    if (!hadVectors) { commitManifest(indexDir, updates, kind); return }
    val oldVectors = currentName(indexDir, "vectors")
    requireUnchanged(indexDir, "vectors", vecSnapshot, updates)
    writePendingMarker(indexDir, oldVectors,
      updates.getOrElse("vectors", oldVectors), vecSnapshot)
    commitManifest(indexDir, updates, kind)
    salvageDrift(s, indexDir, oldVectors, vecSnapshot)
    java.nio.file.Files.delete(pendingMarker(indexDir))
  }

  /** Complete a commit that crashed between its manifest flip and its
    * drift salvage. If the manifest still names the OLD generation the
    * flip never happened — nothing was committed, so the marker (and the
    * staged directories, as unreferenced garbage) are simply dropped. */
  private def healPendingCommit(s: SparkSession, indexDir: String): Unit = {
    val marker = pendingMarker(indexDir)
    if (!java.nio.file.Files.exists(marker)) return
    val lines = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(marker).asScala.toVector
    }
    if (lines.nonEmpty && lines.head == markerHeader) {
      val kv = lines.drop(1).flatMap { l =>
        l.split(" ", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
      }
      val oldVec = kv.collectFirst { case ("old", v) => v }
      val newVec = kv.collectFirst { case ("new", v) => v }
      val snap = kv.collect { case ("snap", v) => v }.toSet
      val cur = manifestMapping(indexDir).get("vectors").map(_._1)
      if (oldVec.isDefined && cur == newVec)
        salvageDrift(s, indexDir, oldVec.get, snap)
      // else: flip never committed (or marker predates this format) —
      // roll back by doing nothing; the sweep reclaims staged dirs
    }
    java.nio.file.Files.delete(marker)
  }

  /** Maintenance entry discipline shared by every index WRITE: serialize
    * on the in-process writer lock, complete any commit that crashed
    * between flip and salvage, then sweep staged directories a crashed
    * rewrite left unreferenced. */
  private def withIndexWriter[A](s: SparkSession, indexDir: String)(
      f: => A): A =
    indexLock(indexDir).synchronized {
      healPendingCommit(s, indexDir)
      sweepUnreferenced(indexDir)
      f
    }

  /** ~128 MB-file partition count for an artifact's current bytes (the
    * compactLog sizing rule). A missing or empty artifact sizes to 1. */
  private def compactTarget(indexDir: String, sub: String): Int = {
    val bytes = walkParquet(indexDir, sub)
      .map(java.nio.file.Files.size(_)).sum
    math.max(1, math.ceil(bytes / (128.0 * 1024 * 1024)).toInt)
  }

  /** Maintenance: compact the per-append file accumulation in the
    * vectors and codes artifacts — the index-side twin of the event
    * log's small-files problem (StreamStore.compactLog). Each artifact
    * rewrites into ~128 MB files, still partitioned by cell, staged to a
    * fresh versioned directory; BOTH commit in one atomic manifest flip,
    * so even the vectors/codes pair can never be observed mixed. NOT
    * purely physical: this is also where the exactly-once read view is
    * restored after an at-least-once ingest retry — vectors dedup to one
    * row per vec_id and codes rebuild from the compacted vectors, so row
    * counts can SHRINK across a compaction of a dirty index. Returns the
    * post-compaction info map (its `files` is the bounded count). */
  def compactVectorIndex(s: SparkSession, indexDir: String): Map[String, Long] =
    withIndexWriter(s, indexDir) {
      import org.apache.spark.sql.SaveMode
      val staged = scala.collection.mutable.Map.empty[String, String]
      val snap0 = resolveAll(indexDir)
      val vecSnapshot = artifactFiles(indexDir, "vectors")
      // the PHYSICAL purge of logical deletes: the vectors rewrite drops
      // tombstoned rows (codes rebuild from the purged vectors), and the
      // tombstone set resets to empty in the SAME atomic flip — after a
      // compaction the deleted rows are gone from disk, not just hidden
      val tomb = tombstonesDf(s, snap0("tombstones"))
      // vectors: ~128 MB files AND one row per vec_id — an at-least-once
      // ingest retry that died between its vectors and codes writes can
      // have landed duplicate vector rows; compaction is where the
      // exactly-once read view is restored (deterministic keep:
      // min (cell, v), which for true retry twins is the identical row)
      if (subdirExists(indexDir, "vectors")) {
        val next = nextDirName(indexDir, "vectors")
        s.read.parquet(snap0("vectors"))
          .join(tomb, Seq("vec_id"), "left_anti")
          .groupBy(col("vec_id"))
          .agg(min(struct(col("cell").cast("long").as("cell"), col("v")))
            .as("m"))
          .select(col("vec_id"), col("m.v").as("v"), col("m.cell").as("cell"))
          .repartition(compactTarget(indexDir, "vectors"), col("cell"))
          .write.partitionBy("cell")
          .mode(SaveMode.Overwrite).parquet(s"$indexDir/$next")
        staged += "vectors" -> next
      }
      // codes: REBUILT from the compacted vectors through the persisted
      // codebooks — restores every invariant in one pass: no duplicate
      // codes, no coded-but-gone vectors, and no committed-but-uncoded
      // vectors (the orphan a crash between an append's two writes
      // leaves invisible to the ADC stage)
      if (subdirExists(indexDir, "codebooks")) {
        val next = nextDirName(indexDir, "codes")
        val src = staged.get("vectors")
          .map(d => s"$indexDir/$d")
          .getOrElse(artifactPath(indexDir, "vectors"))
        encodeCodes(s.read.parquet(src), readCodebooks(s, indexDir))
          .repartition(compactTarget(indexDir, "codes"), col("cell"))
          .write.partitionBy("cell")
          .mode(SaveMode.Overwrite).parquet(s"$indexDir/$next")
        staged += "codes" -> next
      }
      // drain the tombstone set with the purge it describes — one flip
      if (staged.contains("vectors") && subdirExists(indexDir, "tombstones")) {
        val next = nextDirName(indexDir, "tombstones")
        emptyTombstones(s).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/$next")
        staged += "tombstones" -> next
      }
      if (staged.nonEmpty)
        commitStaged(s, indexDir, staged.toMap, vecSnapshot, kind = "compact")
      vectorIndexInfo(s, indexDir)
    }

  /** Maintenance: retrain the index FROM its own artifacts — the vector
    * twin of the dedup index's re-band (Dedup.rebandDedupIndex): the
    * corpus of record is never re-read. One integer-Lloyd step over the
    * persisted assignment: new centroids are the truncated mean of each
    * CURRENT cell's members, every vector reassigns to its nearest new
    * centroid (the skew answer — a hot cell's mass pulls its centroid and
    * boundary vectors migrate out), codebooks retrain on the bounded
    * sample of index vectors, and codes re-encode. All four artifacts
    * stage to fresh versioned directories and commit in ONE atomic
    * manifest flip, so a crash mid-retrain leaves the live index
    * untouched and a reader can never observe new centroids over old
    * cell membership. */
  def retrainVectorIndex(s: SparkSession, indexDir: String): Map[String, Long] =
    withIndexWriter(s, indexDir) {
    import org.apache.spark.sql.SaveMode
    val vecSnapshot = artifactFiles(indexDir, "vectors")
    val snap0 = resolveAll(indexDir)
    val staged = indexArtifacts.map(sub =>
      sub -> nextDirName(indexDir, sub)).toMap
    def stagedPath(sub: String): String = s"$indexDir/${staged(sub)}"
    // retrain is a full rewrite, so it doubles as the physical purge:
    // tombstoned rows never enter the new generation (they'd otherwise
    // pull the retrained centroids toward deleted mass)
    val vecs = s.read.parquet(snap0("vectors"))
      .join(tombstonesDf(s, snap0("tombstones")), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("v"), col("cell").cast("long").as("cell"))
      .persist() // settle: centroid update + reassignment + PQ sample read it
    try {
      vecs.count()
      vecs.select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cell"), col("i"))
        .agg(expr("sum(x) DIV count(1)").as("cx"))
        .groupBy(col("cell"))
        .agg(transform(sort_array(collect_list(struct(col("i"), col("cx")))),
          p => p.getField("cx")).as("c"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(stagedPath("centroids"))
      val cents = s.read.parquet(stagedPath("centroids"))
        .orderBy("cell").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      // the rewrite IS a compaction opportunity: repartition on cell so
      // the retrained layout lands at ~128 MB files instead of one file
      // per (shuffle partition × cell)
      val assigned = vecs.select(col("vec_id"), col("v"),
          nearestCell(cents).as("b"))
        .select(col("vec_id"), col("v"), col("b.cell").as("cell"))
      assigned.repartition(compactTarget(indexDir, "vectors"), col("cell"))
        .write.partitionBy("cell")
        .mode(SaveMode.Overwrite).parquet(stagedPath("vectors"))
      // retrain is where a GROWN index steps its geometry: re-derive the
      // subspace count from the accumulated count, like a fresh build
      // would (unchanged data → unchanged geometry → identical answers,
      // the ServerSpec pin)
      val nNow = vecs.count()
      val dNow = vecs.select(size(col("v"))).head.getInt(0)
      val mNow = pqSubspaces(nNow, dNow)
      val books = trainCodebooks(s, vecs.select(col("vec_id"), col("v")),
        mNow, dNow / mNow, pqK)
      writeCodebooks(s, stagedPath("codebooks"), books)
      encodeCodes(s.read.parquet(stagedPath("vectors")), books)
        .repartition(compactTarget(indexDir, "codes"), col("cell"))
        .write.partitionBy("cell")
        .mode(SaveMode.Overwrite).parquet(stagedPath("codes"))
      // the purge drains the tombstone set in the same flip
      emptyTombstones(s).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(stagedPath("tombstones"))
      // all staged generations commit in one atomic flip — no reader
      // ever sees a mixed generation, and in-flight readers drain
      // against the retained previous generation
      commitStaged(s, indexDir, staged, vecSnapshot, kind = "retrain")
      vectorIndexInfo(s, indexDir)
    } finally vecs.unpersist(false)
  }

  private def centroidIndex(s: SparkSession, dir: String): DataFrame = {
    // entries for stopped sessions are dead weight (and their cached
    // blocks unreachable): sweep them on access so the map is bounded by
    // LIVE sessions × corpora
    centroids.getOrBuild(s, dir) {
      val d = emb(s, dir)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("label"), col("i"), col("x").cast("double").as("x"))
      val cent = d.groupBy(col("label"), col("i"))
        .agg((sum(dec(col("x"))).cast("double") / count(lit(1))).as("c"))
        .persist()
      cent.count() // materialize eagerly: consumers fork the plan 3 ways
      cent
    }
  }

  private[queries] val dimsSql =
    """dims AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings)""".stripMargin

  /** IVF-probed exact-cosine top-k over (vec_id, label, cos): pick the
    * nearest centroid cell by cosine against the persisted centroid
    * index, then pay the exact cosine ONLY within the probed cell.
    * Shared by q_knn_ivf and Retrieval's hybrid IVF leg, so the probe
    * discipline (and its recall contract) can never fork. */
  private[queries] def ivfTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val q = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .filter(col("vec_id") === 0)
      .select(col("i").as("qi"), col("x").cast("double").as("qx"))
    val cent = centroidIndex(s, dir)
    val centNorm = cent.groupBy("label")
      .agg(sum(dec(col("c") * col("c"))).cast("double").as("cn2"))
    val centDot = cent.join(broadcast(q), col("i") === col("qi"))
      .groupBy("label")
      .agg(sum(dec(col("c") * col("qx"))).cast("double").as("cdot"))
    val best = centDot.join(centNorm, "label")
      .select(col("label"), (col("cdot") / sqrt(col("cn2"))).as("score"))
      .orderBy(col("score").desc, col("label")).limit(1)
      .select(col("label").as("best_label"))
    emb(s, dir).filter(col("vec_id") =!= 0)
      .join(broadcast(best), col("label") === col("best_label"))
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), col("label"),
        Vec.cosine(col("embedding"), col("q_emb"),
          Vec.norm2(col("embedding")), col("qn2")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** DuckDB twin of [[ivfTopK]]'s probe: the CTE body from the query
    * projection through the per-cell exact dots (expects `dims` in
    * scope); callers append their own final select over dots/norms/qn. */
  private[queries] val ivfProbeSqlBody =
    """q AS (SELECT i AS qi, x AS qx FROM dims WHERE vec_id = 0),
      |cent AS (
      |  SELECT label, i, CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS c
      |  FROM dims GROUP BY label, i),
      |centnorm AS (
      |  SELECT label, CAST(sum(CAST(c * c AS DECIMAL(25,10))) AS DOUBLE) AS cn2
      |  FROM cent GROUP BY label),
      |centdot AS (
      |  SELECT label, CAST(sum(CAST(c * qx AS DECIMAL(25,10))) AS DOUBLE) AS cdot
      |  FROM cent JOIN q ON i = qi GROUP BY label),
      |best AS (
      |  SELECT label AS best_label FROM centdot JOIN centnorm USING (label)
      |  ORDER BY cdot / sqrt(cn2) DESC, label LIMIT 1),
      |norms AS (
      |  SELECT vec_id, label, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
      |  FROM dims GROUP BY vec_id, label),
      |qn AS (SELECT n2 AS qn2 FROM norms WHERE vec_id = 0),
      |dots AS (
      |  SELECT vec_id, dims.label, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
      |  FROM dims JOIN best ON dims.label = best_label JOIN q ON i = qi
      |  WHERE vec_id <> 0 GROUP BY vec_id, dims.label)""".stripMargin

  // the delete gate's fixture: ONE (build over the full corpus → delete
  // vec_id % 5 = 0) persisted index per (session, corpus) — its own dir,
  // never shared with other gates (a tombstone commit would poison a
  // shared index's answers)
  private val delIndexReady =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def deletedIndexDir(s: SparkSession, dir: String): String =
    delIndexReady.getOrElseUpdate((s, dir), {
      val p = graft.TempDirs.create("graft-vecdel").toString
      buildVectorIndex(s, dir, p)
      deleteFromVectorIndexDf(s,
        emb(s, dir).select(col("vec_id")).filter(col("vec_id") % 5 === 0), p)
      p
    })

  private val kcenterK = 10

  /** The floor(x·64+½)-quantized (vec_id, v) frame, one retained
    * generation per (session, corpus) — shared by q_emb_kmeans and
    * q_emb_kcenter so a full-suite run quantizes the corpus once and
    * holds one persisted copy, not two. */
  private def quantizedFrame(s: SparkSession, dir: String): DataFrame =
    kmCaches.getOrBuild(s, dir) {
      val qv = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
        .persist()
      qv.count() // settle: multiple gate passes fork this plan
      qv
    }

  /** DuckDB twin of the greedy k-center loop: K−1 unrolled layers, each
    * MATERIALIZED (md_{k-1} is referenced by both the argmax and the
    * next min-fold — DuckDB inlines CTEs, so without materialization the
    * chain re-evaluates 2^K times, the BPE-oracle lesson). Distances are
    * exact integer L2 over the floor(x·64+½) quantization. The md > 0
    * filter on each emitted pick is the degenerate-corpus stop: once the
    * covering radius hits 0 every point is covered and the greedy loop
    * has nothing left to select (the Spark side breaks at that round). */
  private lazy val kcenterSql: String = {
    val layers = (2 to kcenterK).map { k =>
      val pick =
        s"""c$k AS (
           |  SELECT vec_id, md FROM md${k - 1} ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
      if (k == kcenterK) pick
      else pick + ",\n" +
        s"""c${k}v AS (
           |  SELECT q.v FROM qv q JOIN c$k USING (vec_id)),
           |md$k AS MATERIALIZED (
           |  SELECT m.vec_id, m.v,
           |    least(m.md, list_sum(list_transform(range(1, 65),
           |      i -> (m.v[i] - c.v[i]) * (m.v[i] - c.v[i])))) AS md
           |  FROM md${k - 1} m, c${k}v c)""".stripMargin
    }.mkString(",\n")
    val sel = (Seq(
      "SELECT 1 AS sel_rank, CAST(0 AS BIGINT) AS vec_id, CAST(0 AS BIGINT) AS d2") ++
      (2 to kcenterK).map(k => s"SELECT $k, vec_id, md FROM c$k WHERE md > 0"))
      .mkString("\nUNION ALL\n")
    s"""WITH qv AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)) AS v
       |  FROM embeddings),
       |c1v AS (SELECT v FROM qv WHERE vec_id = 0),
       |md1 AS MATERIALIZED (
       |  SELECT m.vec_id, m.v,
       |    list_sum(list_transform(range(1, 65),
       |      i -> (m.v[i] - c.v[i]) * (m.v[i] - c.v[i]))) AS md
       |  FROM qv m, c1v c),
       |$layers
       |SELECT CAST(sel_rank AS BIGINT) AS sel_rank, vec_id, CAST(d2 AS BIGINT) AS d2
       |FROM ($sel) ORDER BY sel_rank""".stripMargin
  }

  val all: Map[String, Q] = Map(

    // ---- brute-force cosine top-k against the vec_id=0 query vector ----
    "q_knn_brute" -> Q(
      (s, dir) =>
        emb(s, dir).filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(queryVec(s, dir)))
          .select(col("vec_id"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), col("qn2")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10),
      Some(s"""WITH $dimsSql,
              |norms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id),
              |q AS (SELECT i AS qi, x AS qx FROM dims WHERE vec_id = 0),
              |qn AS (SELECT n2 AS qn2 FROM norms WHERE vec_id = 0),
              |dots AS (
              |  SELECT vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims JOIN q ON i = qi WHERE vec_id <> 0 GROUP BY vec_id)
              |SELECT vec_id, dot / (sqrt(n2) * sqrt(qn2)) AS cos
              |FROM dots JOIN norms USING (vec_id), qn
              |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- Matryoshka two-stage kNN: prefix-dim probe, full-dim rerank ----
    // Matryoshka Representation Learning (Kusupati et al., 2022,
    // arXiv:2205.13147) trains embeddings whose PREFIX is itself a valid
    // lower-dim embedding — the retrieval pattern that buys is a cheap
    // first pass over the first P dims followed by an exact full-dim
    // rerank of the survivors ("adaptive retrieval", MRL §4.3). Stage 1
    // scores every vector on dims 1..16 only (¼ of the arithmetic and —
    // in a column-pruned layout or a prefix index — ¼ of the bytes) and
    // TakeOrders C=50 candidates; stage 2 pays the full-dim exact
    // decimal cosine for those 50 alone. Both cosines are the Vec
    // decimal-fold, so ranking is bit-identical cross-engine; the recall
    // trade is the prefix's fidelity (pinned by GatesSpec against an
    // independent recompute of both stages). At 100 TB the corpus-
    // proportional term is the prefix pass; the rerank is O(C·d).
    "q_knn_matryoshka" -> Q(
      (s, dir) => {
        val qp = emb(s, dir).filter(col("vec_id") === 0)
          .select(slice(col("embedding"), 1, 16).as("q_pre"),
            col("embedding").as("q_emb"))
          .select(col("q_pre"), col("q_emb"),
            Vec.norm2(col("q_pre")).as("pqn2"),
            Vec.norm2(col("q_emb")).as("qn2"))
        val cand = emb(s, dir).filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qp))
          .select(col("vec_id"), col("embedding"), col("q_emb"), col("qn2"),
            Vec.cosine(slice(col("embedding"), 1, 16), col("q_pre"),
              Vec.norm2(slice(col("embedding"), 1, 16)), col("pqn2"))
              .as("pcos"))
          .orderBy(col("pcos").desc, col("vec_id")).limit(50)
        cand.select(col("vec_id"), col("pcos"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), col("qn2")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(10)
      },
      Some(s"""WITH $dimsSql,
              |pnorms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS pn2
              |  FROM dims WHERE i <= 16 GROUP BY vec_id),
              |norms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id),
              |pq AS (SELECT i AS qi, x AS qx FROM dims WHERE vec_id = 0 AND i <= 16),
              |q AS (SELECT i AS qi, x AS qx FROM dims WHERE vec_id = 0),
              |pqn AS (SELECT pn2 AS pqn2 FROM pnorms WHERE vec_id = 0),
              |qn AS (SELECT n2 AS qn2 FROM norms WHERE vec_id = 0),
              |pdots AS (
              |  SELECT vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS pdot
              |  FROM dims JOIN pq ON i = qi WHERE vec_id <> 0 GROUP BY vec_id),
              |cand AS MATERIALIZED (
              |  SELECT vec_id, pdot / (sqrt(pn2) * sqrt(pqn2)) AS pcos
              |  FROM pdots JOIN pnorms USING (vec_id), pqn
              |  ORDER BY pcos DESC, vec_id LIMIT 50),
              |dots AS (
              |  SELECT d.vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims d JOIN cand USING (vec_id) JOIN q ON i = qi
              |  GROUP BY d.vec_id)
              |SELECT vec_id, pcos, dot / (sqrt(n2) * sqrt(qn2)) AS cos
              |FROM dots JOIN cand USING (vec_id) JOIN norms USING (vec_id), qn
              |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- multi-probe IVF: scan the TOP-2 cells. Probe-1's recall cliff
    // (the true neighbor sits just across a cell boundary) is the known
    // IVF failure mode; probing P cells trades P/cells of the data for
    // recall — the standard production knob ----
    "q_knn_ivf2" -> Q(
      (s, dir) => {
        val q = emb(s, dir)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
          .filter(col("vec_id") === 0)
          .select(col("i").as("qi"), col("x").cast("double").as("qx"))
        val cent = centroidIndex(s, dir)
        val centNorm = cent.groupBy("label")
          .agg(sum(dec(col("c") * col("c"))).cast("double").as("cn2"))
        val centDot = cent.join(broadcast(q), col("i") === col("qi"))
          .groupBy("label")
          .agg(sum(dec(col("c") * col("qx"))).cast("double").as("cdot"))
        val best2 = centDot.join(centNorm, "label")
          .select(col("label"), (col("cdot") / sqrt(col("cn2"))).as("score"))
          .orderBy(col("score").desc, col("label")).limit(2)
          .select(col("label").as("best_label"))
        emb(s, dir).filter(col("vec_id") =!= 0)
          .join(broadcast(best2), col("label") === col("best_label"))
          .crossJoin(broadcast(queryVec(s, dir)))
          .select(col("vec_id"), col("label"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), col("qn2")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $dimsSql,
              |q AS (SELECT i AS qi, x AS qx FROM dims WHERE vec_id = 0),
              |cent AS (
              |  SELECT label, i, CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS c
              |  FROM dims GROUP BY label, i),
              |centnorm AS (
              |  SELECT label, CAST(sum(CAST(c * c AS DECIMAL(25,10))) AS DOUBLE) AS cn2
              |  FROM cent GROUP BY label),
              |centdot AS (
              |  SELECT label, CAST(sum(CAST(c * qx AS DECIMAL(25,10))) AS DOUBLE) AS cdot
              |  FROM cent JOIN q ON i = qi GROUP BY label),
              |best AS (
              |  SELECT label AS best_label FROM centdot JOIN centnorm USING (label)
              |  ORDER BY cdot / sqrt(cn2) DESC, label LIMIT 2),
              |norms AS (
              |  SELECT vec_id, label, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id, label),
              |qn AS (SELECT n2 AS qn2 FROM norms WHERE vec_id = 0),
              |dots AS (
              |  SELECT vec_id, dims.label, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims JOIN best ON dims.label = best_label JOIN q ON i = qi
              |  WHERE vec_id <> 0 GROUP BY vec_id, dims.label)
              |SELECT vec_id, label, dot / (sqrt(n2) * sqrt(qn2)) AS cos
              |FROM dots JOIN norms USING (vec_id, label), qn
              |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- LSH-bucketed ANN: sign-bit hyperplane hash (the axis-aligned
    // special case), probe ONLY the query's bucket. 16 cells here; the
    // knob scales with corpus (more sign dims → smaller buckets). Recall
    // is the LSH trade — the oracle applies the identical restriction, so
    // the answer set matches bit-for-bit ----
    "q_knn_lsh" -> Q(
      (s, dir) => {
        val cell = (0 until 4).map(i =>
          when(element_at(col("embedding"), i + 1) >= 0, lit(1 << i))
            .otherwise(lit(0))).reduce(_ + _)
        val e = emb(s, dir).withColumn("cell", cell)
        val qcell = e.filter(col("vec_id") === 0)
          .select(col("cell").as("qcell"),
            col("embedding").as("q_emb"), Vec.norm2(col("embedding")).as("qn2"))
        e.filter(col("vec_id") =!= 0)
          .join(broadcast(qcell), col("cell") === col("qcell"))
          .select(col("vec_id"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), col("qn2")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $dimsSql,
              |cells AS (
              |  SELECT vec_id,
              |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
              |    + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
              |    + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
              |    + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS cell
              |  FROM embeddings),
              |qc AS (SELECT cell AS qcell FROM cells WHERE vec_id = 0),
              |cand AS (
              |  SELECT c.vec_id FROM cells c, qc WHERE c.cell = qc.qcell AND c.vec_id <> 0),
              |norms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id),
              |q AS (SELECT i AS qi, x AS qx FROM dims WHERE vec_id = 0),
              |qn AS (SELECT n2 AS qn2 FROM norms WHERE vec_id = 0),
              |dots AS (
              |  SELECT vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims JOIN q ON i = qi
              |  WHERE vec_id IN (SELECT vec_id FROM cand) GROUP BY vec_id)
              |SELECT vec_id, dot / (sqrt(n2) * sqrt(qn2)) AS cos
              |FROM dots JOIN norms USING (vec_id), qn
              |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- IVF-style: probe nearest coarse cell, scan only that cell ----
    "q_knn_ivf" -> Q(
      (s, dir) => ivfTopK(s, dir, 10),
      Some(s"""WITH $dimsSql,
              |$ivfProbeSqlBody
              |SELECT vec_id, label, dot / (sqrt(n2) * sqrt(qn2)) AS cos
              |FROM dots JOIN norms USING (vec_id, label), qn
              |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- greedy k-center coreset selection (diversity subsetting) ----
    // The data-curation shape for "pick a maximally diverse seed set":
    // the classic 2-approximation — seed with vec 0, then K−1 times take
    // the point FARTHEST from the chosen set (its distance = the covering
    // radius at that step, so the emitted d2 sequence is the coreset's
    // quality curve, non-increasing by construction). Distances are exact
    // integer L2 over the floor(x·64+½) quantization, argmax ties break
    // to the smaller vec_id — fully deterministic, no floats ranked.
    // Scale shape: each round is ONE embarrassingly parallel pass over
    // the persisted quantized frame (a projection + TakeOrdered argmax —
    // no joins, no shuffle beyond the 1-row truncation) plus a bounded
    // 1-row driver sync (the k-means discipline); K passes total. The
    // min-distance column folds forward, so round k never recomputes
    // rounds 1..k−1.
    "q_emb_kcenter" -> Q(
      (s, dir) => {
        val qv = quantizedFrame(s, dir) // shared with q_emb_kmeans
        def distTo(c: Seq[Long]): Column =
          aggregate(zip_with(col("v"), array(c.map(lit): _*),
            (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
        val c1 = qv.filter(col("vec_id") === 0).select(col("v"))
          .head().getSeq[Long](0)
        var frontier = qv
          .select(col("vec_id"), col("v"), distTo(c1).as("md")).persist()
        val sel = Seq.newBuilder[(Long, Long, Long)]
        try {
          frontier.count()
          sel += ((1L, 0L, 0L))
          var k = 2
          var covered = false
          while (k <= kcenterK && !covered) {
            val best = frontier.orderBy(col("md").desc, col("vec_id")).limit(1)
              .select(col("vec_id"), col("md"), col("v")).head()
            // covering radius 0 = every point coincides with a chosen
            // center; the greedy loop has nothing left to select (the
            // oracle's md > 0 filter is the same stop)
            if (best.getLong(1) == 0L) covered = true
            else {
              sel += ((k.toLong, best.getLong(0), best.getLong(1)))
              if (k < kcenterK) {
                val next = frontier.select(col("vec_id"), col("v"),
                  least(col("md"), distTo(best.getSeq[Long](2))).as("md"))
                  .persist()
                next.count() // settle before releasing the prior round
                frontier.unpersist(false)
                frontier = next
              }
              k += 1
            }
          }
        } finally frontier.unpersist(false) // qv stays: GateCache-owned
        import s.implicits._
        sel.result().toDF("sel_rank", "vec_id", "d2")
          .orderBy(col("sel_rank"))
      },
      Some(kcenterSql)),

    // ---- batched kNN join: top-5 neighbors for EVERY query in a batch ----
    // The pipeline shape (dedup against a seed set, retrieval eval): the
    // query batch is broadcast (bounded by construction), each corpus row
    // scores against all queries map-side, and the per-query top-k runs
    // as a rank-filtered window — Spark 4's InferWindowGroupLimit turns
    // that into a map-side partial group-limit before the qid shuffle, so
    // the exchange carries O(queries · k · partitions) rows, not N·Q.
    "q_knn_join" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.VectorExpressions.register(s)
        val qs = emb(s, dir).filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
        // two-stage scoring, same contract as q_dedup_embedding: the
        // codegen double cosine scores every (row, query) pair (cheap),
        // and only the per-query threshold band d5 − 1e-6 pays the exact
        // decimal fold. |double − exact| < 1e-9 per pair, so every true
        // top-5 member clears the band: the 5 double-best rows have
        // exact ≥ d5 − 1e-9, while anything under the band has
        // exact < d5 − 1e-6 + 1e-9 — strictly dominated. The final
        // ranking (and the emitted cos) is the exact fold, identical to
        // the oracle's explode+group-sum.
        val wq = Window.partitionBy(col("qid"))
        def scored = emb(s, dir).filter(col("vec_id") % 100 =!= 0)
          .crossJoin(broadcast(qs))
          .select(col("qid"), col("vec_id"), col("embedding"), col("q_emb"),
            expr("cosine_sim(embedding, q_emb)").as("dbl"))
        // Pass 1 finds each query's 5th-best DOUBLE cosine: the rank-≤5
        // filter is the shape Spark's InferWindowGroupLimit rewrites into
        // a MAP-SIDE partial group limit, and the rows are projected to
        // (qid, vec_id, dbl) first, so the qid exchange carries O(Q·5)
        // fixed-width rows — never N·Q, never an embedding.
        val d5 = scored.select(col("qid"), col("vec_id"), col("dbl"))
          .withColumn("rk_d", row_number().over(
            wq.orderBy(col("dbl").desc, col("vec_id"))))
          .filter(col("rk_d") <= 5)
          .groupBy("qid").agg(min(col("dbl")).as("d5"))
        // Pass 2 re-scans and keeps EVERY row within 1e-6 of that
        // threshold — the band is adaptive, so dense cosine ties (the
        // near-duplicate corpus case) can never evict a true top-5 row,
        // unlike a fixed rank-K precut. The threshold table is one row
        // per query in the batch — it rides the same boundedness as the
        // broadcast query batch itself.
        scored.join(broadcast(d5), Seq("qid"))
          .filter(col("dbl") >= col("d5") - 1e-6)
          .select(col("qid"), col("vec_id"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), Vec.norm2(col("q_emb"))).as("cos"))
          .withColumn("rk", row_number().over(
            wq.orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("rk").cast("long").as("rk"),
            col("vec_id"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH $dimsSql,
              |norms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id),
              |q AS (SELECT vec_id AS qid, i AS qi, x AS qx FROM dims WHERE vec_id % 100 = 0),
              |qn AS (SELECT vec_id AS qid, n2 AS qn2 FROM norms WHERE vec_id % 100 = 0),
              |dots AS (
              |  SELECT qid, vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims JOIN q ON i = qi WHERE vec_id % 100 <> 0 GROUP BY qid, vec_id),
              |ranked AS (
              |  SELECT qid, vec_id, dot / (sqrt(n2) * sqrt(qn2)) AS cos,
              |         row_number() OVER (PARTITION BY qid
              |           ORDER BY dot / (sqrt(n2) * sqrt(qn2)) DESC, vec_id) AS rk
              |  FROM dots JOIN norms USING (vec_id) JOIN qn USING (qid))
              |SELECT qid, rk, vec_id, cos FROM ranked WHERE rk <= 5
              |ORDER BY qid, rk""".stripMargin)),

    // ---- hard-negative mining for contrastive training ----
    // For each anchor in a bounded batch: the top-3 most-similar vectors
    // with a DIFFERENT label — the "looks like you but isn't" rows a
    // contrastive/embedding trainer pairs against its positives. Same
    // two-stage discipline as q_knn_join (cheap codegen double cosine
    // scores every candidate, only the adaptive per-anchor band pays the
    // exact decimal fold; the rank-≤3 precut is the map-side
    // WindowGroupLimit shape, so the anchor-keyed exchange carries
    // O(anchors·3) fixed-width rows, never an embedding). At 100 TB the
    // anchor batch is the broadcast bound and the corpus is scanned
    // twice; a production variant composes with the IVF cells to score
    // only neighboring cells.
    "q_mining_hard_negatives" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.VectorExpressions.register(s)
        val qs = emb(s, dir).filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("label").as("q_label"),
            col("embedding").as("q_emb"))
        val wq = Window.partitionBy(col("qid"))
        def scored = emb(s, dir)
          .crossJoin(broadcast(qs))
          .filter(col("label") =!= col("q_label"))
          .select(col("qid"), col("vec_id"), col("embedding"), col("q_emb"),
            expr("cosine_sim(embedding, q_emb)").as("dbl"))
        val d3 = scored.select(col("qid"), col("vec_id"), col("dbl"))
          .withColumn("rk_d", row_number().over(
            wq.orderBy(col("dbl").desc, col("vec_id"))))
          .filter(col("rk_d") <= 3)
          .groupBy("qid").agg(min(col("dbl")).as("d3"))
        scored.join(broadcast(d3), Seq("qid"))
          .filter(col("dbl") >= col("d3") - 1e-6)
          .select(col("qid"), col("vec_id"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), Vec.norm2(col("q_emb"))).as("cos"))
          .withColumn("rk", row_number().over(
            wq.orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("rk").cast("long").as("rk"),
            col("vec_id"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH $dimsSql,
              |norms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id),
              |lbl AS (SELECT vec_id, label FROM embeddings),
              |q AS (SELECT vec_id AS qid, i AS qi, x AS qx FROM dims WHERE vec_id % 100 = 0),
              |qn AS (SELECT vec_id AS qid, n2 AS qn2 FROM norms WHERE vec_id % 100 = 0),
              |ql AS (SELECT vec_id AS qid, label AS q_label FROM embeddings WHERE vec_id % 100 = 0),
              |dots AS (
              |  SELECT qid, vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims JOIN q ON i = qi GROUP BY qid, vec_id),
              |ranked AS (
              |  SELECT qid, vec_id, dot / (sqrt(n2) * sqrt(qn2)) AS cos,
              |         row_number() OVER (PARTITION BY qid
              |           ORDER BY dot / (sqrt(n2) * sqrt(qn2)) DESC, vec_id) AS rk
              |  FROM dots JOIN norms USING (vec_id) JOIN qn USING (qid)
              |  JOIN lbl USING (vec_id) JOIN ql USING (qid)
              |  WHERE lbl.label <> ql.q_label)
              |SELECT qid, rk, vec_id, cos FROM ranked WHERE rk <= 3
              |ORDER BY qid, rk""".stripMargin)),

    // ---- hard-negative mining, IVF-composed (the production variant) ----
    // The variant the brute gate's doc comment names: instead of scoring
    // every cross-label vector, each anchor probes its nearest FOREIGN
    // centroid cell (argmax centroid-cosine over cells with a different
    // label — the batch generalization of ivfTopK's probe, same
    // persisted centroidIndex) and pays the exact decimal cosine only
    // within that one cell. At 100 TB the per-anchor candidate set is a
    // cell, not the corpus — the probe is O(anchors · cells · d) against
    // the metadata-sized centroid table, and the recall trade is exactly
    // q_knn_ivf's (a true hard negative hiding in a non-nearest foreign
    // cell is missed). Candidates are cell members by construction, so
    // the cross-label constraint is enforced by the probe itself.
    "q_mining_hard_negatives_ivf" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.VectorExpressions.register(s)
        val qs = emb(s, dir).filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("label").as("q_label"),
            col("embedding").as("q_emb"))
        val qd = emb(s, dir).filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"),
            posexplode(col("embedding")).as(Seq("qi", "qx")))
          .select(col("qid"), col("qi"), col("qx").cast("double").as("qx"))
        val cent = centroidIndex(s, dir)
        val centNorm = cent.groupBy("label")
          .agg(sum(dec(col("c") * col("c"))).cast("double").as("cn2"))
        val centDot = cent.join(broadcast(qd), col("i") === col("qi"))
          .groupBy(col("qid"), col("label"))
          .agg(sum(dec(col("c") * col("qx"))).cast("double").as("cdot"))
        val tgt = centDot.join(centNorm, "label")
          .join(broadcast(qs.select(col("qid"), col("q_label"))), "qid")
          .filter(col("label") =!= col("q_label"))
          .select(col("qid"), col("label"),
            (col("cdot") / sqrt(col("cn2"))).as("sc"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("sc").desc, col("label"))))
          .filter(col("rn") === 1)
          .select(col("qid"), col("label").as("tgt_label"))
        val wq = Window.partitionBy(col("qid"))
        emb(s, dir).filter(col("vec_id") % 100 =!= 0)
          .join(broadcast(tgt.join(qs, "qid")),
            col("label") === col("tgt_label"))
          .select(col("qid"), col("vec_id"),
            Vec.cosine(col("embedding"), col("q_emb"),
              Vec.norm2(col("embedding")), Vec.norm2(col("q_emb"))).as("cos"))
          .withColumn("rk", row_number().over(
            wq.orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 3)
          .select(col("qid"), col("rk").cast("long").as("rk"),
            col("vec_id"), col("cos"))
          .orderBy(col("qid"), col("rk"))
      },
      Some(s"""WITH $dimsSql,
              |norms AS (
              |  SELECT vec_id, CAST(sum(CAST(x * x AS DECIMAL(25,10))) AS DOUBLE) AS n2
              |  FROM dims GROUP BY vec_id),
              |q AS (SELECT vec_id AS qid, i AS qi, x AS qx FROM dims WHERE vec_id % 100 = 0),
              |qn AS (SELECT vec_id AS qid, n2 AS qn2 FROM norms WHERE vec_id % 100 = 0),
              |ql AS (SELECT vec_id AS qid, label AS q_label FROM embeddings WHERE vec_id % 100 = 0),
              |cent AS (
              |  SELECT label, i, CAST(sum(CAST(x AS DECIMAL(25,10))) AS DOUBLE) / count(*) AS c
              |  FROM dims GROUP BY label, i),
              |centnorm AS (
              |  SELECT label, CAST(sum(CAST(c * c AS DECIMAL(25,10))) AS DOUBLE) AS cn2
              |  FROM cent GROUP BY label),
              |centdot AS (
              |  SELECT qid, label, CAST(sum(CAST(c * qx AS DECIMAL(25,10))) AS DOUBLE) AS cdot
              |  FROM cent JOIN q ON i = qi GROUP BY qid, label),
              |tgt AS (
              |  SELECT qid, label AS tgt_label FROM (
              |    SELECT cd.qid, cd.label,
              |      row_number() OVER (PARTITION BY cd.qid
              |        ORDER BY cd.cdot / sqrt(cn.cn2) DESC, cd.label) AS rn
              |    FROM centdot cd JOIN centnorm cn USING (label)
              |    JOIN ql USING (qid)
              |    WHERE cd.label <> q_label) WHERE rn = 1),
              |lbl AS (SELECT vec_id, label FROM embeddings),
              |dots AS (
              |  SELECT qid, vec_id, CAST(sum(CAST(x * qx AS DECIMAL(25,10))) AS DOUBLE) AS dot
              |  FROM dims JOIN q ON i = qi WHERE vec_id % 100 <> 0 GROUP BY qid, vec_id),
              |ranked AS (
              |  SELECT d.qid, d.vec_id, dot / (sqrt(n2) * sqrt(qn2)) AS cos,
              |         row_number() OVER (PARTITION BY d.qid
              |           ORDER BY dot / (sqrt(n2) * sqrt(qn2)) DESC, d.vec_id) AS rk
              |  FROM dots d JOIN norms USING (vec_id) JOIN qn USING (qid)
              |  JOIN lbl USING (vec_id) JOIN tgt USING (qid)
              |  WHERE lbl.label = tgt.tgt_label)
              |SELECT qid, rk, vec_id, cos FROM ranked WHERE rk <= 3
              |ORDER BY qid, rk""".stripMargin)),

    // ---- k-means (Lloyd, 2 iterations) over integer-quantized vectors ----
    // The IVF-training step the probe queries assume: embeddings quantize
    // to small ints (floor(x*64+0.5) — identical rounding both engines),
    // the K=8 lowest vec_ids seed the centroids, and each iteration is
    //   assign: one map-only pass computing K in-row squared distances
    //           (argmin via array_min over (d, j) structs — ties break to
    //           the lower centroid id on both engines);
    //   update: one (cl, dim) shuffle with partial aggregation, then an
    //           O(K·d) collect to refresh the broadcast centroids — the
    //           same driver-sync MLlib's k-means does; empty clusters
    //           keep their previous centroid.
    // All arithmetic is integer (squared L2 on ints, truncating DIV for
    // the mean), so 2 unrolled iterations match the oracle exactly. At
    // 100 TB the per-iteration cost is a linear scan + one bounded
    // shuffle; nothing grows with corpus size except the scan.
    "q_emb_kmeans" -> Q(
      (s, dir) => {
        val K = 8
        // 3 assignment passes + 2 updates fork the shared quantized frame
        val qv = quantizedFrame(s, dir)
        var cents: Seq[(Int, Seq[Long])] = qv.orderBy("vec_id").limit(K)
          .collect().toSeq.zipWithIndex
          .map { case (r, j) => (j, r.getSeq[Long](1)) }
        def assign(cs: Seq[(Int, Seq[Long])]): DataFrame = {
          val dists = cs.map { case (j, v) =>
            struct(
              aggregate(zip_with(col("v"), typedlit(v), (a, b) => (a - b) * (a - b)),
                lit(0L), (acc, x) => acc + x).as("d"),
              lit(j).as("j"))
          }
          qv.select(col("vec_id"), col("v"), array_min(array(dists: _*)).as("best"))
            .select(col("vec_id"), col("v"),
              col("best.j").as("cl"), col("best.d").as("d"))
        }
        for (_ <- 1 to 2) {
          val upd = assign(cents)
            .select(col("cl"), posexplode(col("v")).as(Seq("i", "x")))
            .groupBy("cl", "i")
            .agg(expr("sum(x) DIV count(1)").as("cx"))
            .collect()
          val byCl = upd.groupBy(_.getInt(0)).map { case (cl, rows) =>
            cl -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
          }
          cents = cents.map { case (j, old) => (j, byCl.getOrElse(j, old)) }
        }
        assign(cents)
          .groupBy(col("cl").cast("long").as("cl"))
          .agg(count(lit(1)).as("n"), sum(col("d")).as("distortion"),
            min(col("vec_id")).as("min_member"))
          .orderBy(col("cl"))
      },
      Some {
        def iter(prev: String, n: Int): String =
          s"""a$n AS (
             |  SELECT vec_id, j, d,
             |         row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
             |  FROM (SELECT q.vec_id, c.j,
             |          list_aggregate(list_transform(generate_series(1, 64),
             |            i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])), 'sum') AS d
             |        FROM q CROSS JOIN $prev c)),
             |m$n AS (SELECT vec_id, j AS cl, d FROM a$n WHERE rn = 1),
             |u$n AS (
             |  SELECT cl, i, CAST(sum(x) AS BIGINT) // count(*) AS cx
             |  FROM (SELECT m$n.cl, generate_subscripts(q.v, 1) AS i,
             |               unnest(q.v) AS x
             |        FROM q JOIN m$n USING (vec_id))
             |  GROUP BY 1, 2),
             |c$n AS (
             |  SELECT $prev.j, coalesce(nv.v, $prev.v) AS v
             |  FROM $prev LEFT JOIN (SELECT cl AS j, list(cx ORDER BY i) AS v
             |                        FROM u$n GROUP BY 1) nv USING (j))""".stripMargin
        s"""WITH q AS (
           |  SELECT vec_id, list_transform(embedding,
           |    x -> CAST(floor(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)) AS v
           |  FROM embeddings),
           |c0 AS (
           |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
           |  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 8)),
           |${iter("c0", 1)},
           |${iter("c1", 2)},
           |a3 AS (
           |  SELECT vec_id, j, d,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
           |  FROM (SELECT q.vec_id, c.j,
           |          list_aggregate(list_transform(generate_series(1, 64),
           |            i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])), 'sum') AS d
           |        FROM q CROSS JOIN c2 c))
           |SELECT CAST(cl AS BIGINT) AS cl, count(*) AS n,
           |       CAST(sum(d) AS BIGINT) AS distortion,
           |       min(vec_id) AS min_member
           |FROM (SELECT vec_id, j AS cl, d FROM a3 WHERE rn = 1)
           |GROUP BY 1 ORDER BY cl""".stripMargin
      }),

    // ---- product quantization: train + encode + ADC top-10 ----
    // The memory-bounded ANN technique for vector corpora that don't fit
    // as floats: the 64-dim (quantized) vector splits into M=4 subspaces
    // of 16 dims, each subspace trains a K=8 codebook (one Lloyd step
    // over integer-quantized coordinates, the q_emb_kmeans discipline),
    // and every vector compresses to M code bytes. A query then never
    // touches the vectors: its distance to each encoded vector is the sum
    // of M lookups in the precomputed M×K table of exact subspace
    // distances (Asymmetric Distance Computation). Scale shape: training
    // is M bounded collect-syncs of O(K·L) longs (the k-means centroid
    // discipline); encoding is one map-only pass; ADC search is a scan
    // over M byte-codes plus a 32-entry lookup literal — 4 bytes/vector
    // of working set instead of 256, which is why PQ is the 100 TB path.
    // Determinism: codes argmin on (distance, j) over integer distances;
    // truncated-mean updates stay in Long; the ADC table is exact Longs.
    "q_emb_pq" -> Q(
      (s, dir) => pqAdc(s, dir)
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
          col("adc_dist"))
        .orderBy(col("adc_dist"), col("vec_id")).limit(10),
      Some(s"""$pqOracleCtes
             |SELECT q.vec_id, f0.c0, f1.c1, f2.c2, f3.c3,
             |  CAST(qd0.d + qd1.d + qd2.d + qd3.d AS BIGINT) AS adc_dist
             |FROM q JOIN f0 USING (vec_id) JOIN f1 USING (vec_id)
             |  JOIN f2 USING (vec_id) JOIN f3 USING (vec_id)
             |  JOIN qd0 ON qd0.j = f0.c0 JOIN qd1 ON qd1.j = f1.c1
             |  JOIN qd2 ON qd2.j = f2.c2 JOIN qd3 ON qd3.j = f3.c3
             |WHERE q.vec_id <> 0
             |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin)),

    // ---- IVF + PQ: the standard large-scale ANN composition ----
    // The coarse quantizer (the label cell, as q_knn_ivf) prunes the
    // candidate set to ~1/cells of the corpus BEFORE the ADC scan, and
    // the PQ codes make that scan touch 4 bytes per candidate — cells
    // bound the work, codes bound the memory. The query probes its own
    // cell (exactly what IVF assignment yields for an in-corpus query);
    // everything downstream is the same codes-only ADC ranking ----
    "q_knn_ivfpq" -> Q(
      (s, dir) => {
        val coded = pqAdc(s, dir)
        // cast before read: SchemaContract pins label only to the
        // Integral family, so a fixture regeneration may deliver int64 —
        // a bare getInt would throw on that drift
        val qCell = coded.filter(col("vec_id") === 0)
          .select(col("label").cast("long")).head().getLong(0)
        coded.filter(col("vec_id") =!= 0 && col("label") === qCell)
          .select(col("vec_id"), col("label").cast("long").as("cell"),
            col("c0"), col("c1"), col("c2"), col("c3"), col("adc_dist"))
          .orderBy(col("adc_dist"), col("vec_id")).limit(10)
      },
      Some(s"""$pqOracleCtes
             |SELECT q.vec_id, CAST(e.label AS BIGINT) AS cell,
             |  f0.c0, f1.c1, f2.c2, f3.c3,
             |  CAST(qd0.d + qd1.d + qd2.d + qd3.d AS BIGINT) AS adc_dist
             |FROM q JOIN embeddings e USING (vec_id)
             |  JOIN f0 USING (vec_id) JOIN f1 USING (vec_id)
             |  JOIN f2 USING (vec_id) JOIN f3 USING (vec_id)
             |  JOIN qd0 ON qd0.j = f0.c0 JOIN qd1 ON qd1.j = f1.c1
             |  JOIN qd2 ON qd2.j = f2.c2 JOIN qd3 ON qd3.j = f3.c3
             |WHERE q.vec_id <> 0
             |  AND e.label = (SELECT label FROM embeddings WHERE vec_id = 0)
             |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin)),

    // ---- PQ geometry derivation: the code budget follows the corpus ----
    // The subspace count is a corpus-derived knob (the lshRowsPerBand /
    // signBits / Bloom-sizing pattern): integer-threshold knees over n,
    // oracle-replicated with a CASE. The gate emits the derivation over a
    // ladder of corpus sizes (the real n and three scaled points that
    // cross both knees), so the ladder itself — not just one rung — is
    // hash-matched at every sf.
    "q_pq_geometry" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = emb(s, dir)
        val d = e.select(size(col("embedding"))).head.getInt(0)
        val n = e.count()
        Seq(1L, 64L, 4096L, 65536L).map { f =>
          val nn = n * f
          val m = pqSubspaces(nn, d)
          (nn, d.toLong, m.toLong, (d / m).toLong)
        }.toDF("n", "d", "m", "l").orderBy("n")
      },
      Some(s"""WITH stats AS (
              |  SELECT count(*) AS n0,
              |    (SELECT len(embedding) FROM embeddings WHERE vec_id = 0)
              |      AS d
              |  FROM embeddings),
              |ladder AS (
              |  SELECT n0 * f AS n, d
              |  FROM stats, (SELECT unnest([1, 64, 4096, 65536]) AS f))
              |SELECT n, CAST(d AS BIGINT) AS d,
              |  CAST($pqSubspacesSql AS BIGINT) AS m,
              |  CAST(d // ($pqSubspacesSql) AS BIGINT) AS l
              |FROM ladder ORDER BY n""".stripMargin)),

    // ---- targeted deletion: tombstoned ids vanish from the probe ----
    // The right-to-be-forgotten path, gated end to end: build a
    // persisted index over the FULL corpus, DELETE vec_id % 5 = 0
    // (including the query doc itself) through the O(deleted) tombstone
    // commit, then probe through artifactRelation's live view. The
    // oracle recomputes over the SURVIVORS with build-time geometry —
    // centroids and cell membership stay the FULL-corpus ones (a logical
    // delete moves no vectors; the oracle assigns every vector against
    // full-corpus centroids) while candidates exclude every tombstoned
    // id — so the hash-match proves exactly the tombstone semantics.
    "q_vector_delete" -> Q(
      (s, dir) => {
        // phase-split: the one-off build+delete vs the probe the gate
        // actually measures (the q_bm25_indexed pattern)
        graft.PhaseTimings.reset("q_vector_delete")
        val idx = graft.PhaseTimings.timed("q_vector_delete", "index_build") {
          deletedIndexDir(s, dir)
        }
        val qvec = emb(s, dir).filter(col("vec_id") === 0)
          .select(transform(col("embedding"),
            x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")))
          .head.getSeq[Long](0)
        s.sql(ivfIndexProbeSql(artifactRelation(idx),
          s"'${qvec.mkString(",")}'", "10"))
      },
      Some("""WITH qd AS (
             |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 64 + 0.5)
             |      AS BIGINT) AS qx
             |  FROM embeddings),
             |q AS (SELECT i, qx FROM qd WHERE vec_id = 0),
             |cent AS (
             |  SELECT label, i, sum(qx) // count(*) AS cx
             |  FROM qd GROUP BY label, i),
             |vdist AS (
             |  SELECT qd.vec_id, cent.label AS cell,
             |    sum((qd.qx - cent.cx) * (qd.qx - cent.cx)) AS d
             |  FROM qd JOIN cent ON qd.i = cent.i
             |  GROUP BY qd.vec_id, cent.label),
             |assign AS (
             |  SELECT vec_id, cell FROM (
             |    SELECT vec_id, cell,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell)
             |        AS rn
             |    FROM vdist) WHERE rn = 1),
             |cdist AS (
             |  SELECT cent.label AS cell,
             |    sum((cent.cx - q.qx) * (cent.cx - q.qx)) AS cd
             |  FROM cent JOIN q ON cent.i = q.i GROUP BY cent.label),
             |best AS (SELECT cell FROM cdist ORDER BY cd, cell LIMIT 1),
             |cand AS (
             |  SELECT qd.vec_id,
             |    CAST(sum((qd.qx - q.qx) * (qd.qx - q.qx)) AS BIGINT) AS dist
             |  FROM qd JOIN q ON qd.i = q.i
             |  JOIN assign a ON a.vec_id = qd.vec_id
             |  WHERE a.cell = (SELECT cell FROM best) AND qd.vec_id % 5 <> 0
             |  GROUP BY qd.vec_id)
             |SELECT vec_id, dist FROM cand
             |ORDER BY dist, vec_id LIMIT 10""".stripMargin)),

    // ---- time travel: the as-of read of the retained generation ----
    // Every manifest commit appends a complete generation snapshot to
    // the index's HISTORY log, and the one-cycle retention the flip
    // protocol already pays makes the PREVIOUS commit's snapshot
    // readable — so "what did this index answer before that delete?"
    // is a query, not forensics. The gate probes the SAME
    // deleted-index fixture as q_vector_delete, AS OF the build commit
    // (seq 1, before the delete): the oracle is the FULL-corpus IVF
    // recompute with no survivor filter — the deleted ids are visible
    // again, including the distance-0 self hit of the deleted query
    // doc. Together the pair (q_vector_delete, q_vector_asof)
    // hash-pins both sides of the retention boundary.
    "q_vector_asof" -> Q(
      (s, dir) => {
        graft.PhaseTimings.reset("q_vector_asof")
        val idx = graft.PhaseTimings.timed("q_vector_asof", "index_build") {
          deletedIndexDir(s, dir)
        }
        val qvec = emb(s, dir).filter(col("vec_id") === 0)
          .select(transform(col("embedding"),
            x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")))
          .head.getSeq[Long](0)
        s.sql(ivfIndexProbeSql(artifactRelationAsOf(idx, 1),
          s"'${qvec.mkString(",")}'", "10"))
      },
      Some("""WITH qd AS (
             |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 64 + 0.5)
             |      AS BIGINT) AS qx
             |  FROM embeddings),
             |q AS (SELECT i, qx FROM qd WHERE vec_id = 0),
             |cent AS (
             |  SELECT label, i, sum(qx) // count(*) AS cx
             |  FROM qd GROUP BY label, i),
             |vdist AS (
             |  SELECT qd.vec_id, cent.label AS cell,
             |    sum((qd.qx - cent.cx) * (qd.qx - cent.cx)) AS d
             |  FROM qd JOIN cent ON qd.i = cent.i
             |  GROUP BY qd.vec_id, cent.label),
             |assign AS (
             |  SELECT vec_id, cell FROM (
             |    SELECT vec_id, cell,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell)
             |        AS rn
             |    FROM vdist) WHERE rn = 1),
             |cdist AS (
             |  SELECT cent.label AS cell,
             |    sum((cent.cx - q.qx) * (cent.cx - q.qx)) AS cd
             |  FROM cent JOIN q ON cent.i = q.i GROUP BY cent.label),
             |best AS (SELECT cell FROM cdist ORDER BY cd, cell LIMIT 1),
             |cand AS (
             |  SELECT qd.vec_id,
             |    CAST(sum((qd.qx - q.qx) * (qd.qx - q.qx)) AS BIGINT) AS dist
             |  FROM qd JOIN q ON qd.i = q.i
             |  JOIN assign a ON a.vec_id = qd.vec_id
             |  WHERE a.cell = (SELECT cell FROM best)
             |  GROUP BY qd.vec_id)
             |SELECT vec_id, dist FROM cand
             |ORDER BY dist, vec_id LIMIT 10""".stripMargin)),

    // ---- IVF + PQ + exact re-rank: the complete two-stage retrieval ----
    // ADC ranking alone carries quantization loss — production vector
    // search recovers it by re-ranking the top-C ADC candidates with
    // EXACT distances. Stage 1 is the codes-only ADC scan inside the
    // probed cell (4 bytes/vector, as q_knn_ivfpq) truncated to C=50
    // candidates; stage 2 fetches full vectors ONLY behind that bounded
    // candidate set (a C-row broadcast join — at corpus scale this is the
    // ≤C key-value fetches, never a second vector sweep) and re-ranks by
    // the exact integer L2 over the floor(x·64+½) quantization. The gate
    // emits both distances so the quantization error the re-rank corrects
    // is visible data ----
    "q_knn_ivfpq_rerank" -> Q(
      (s, dir) => {
        val coded = pqAdc(s, dir)
        val qCell = coded.filter(col("vec_id") === 0)
          .select(col("label").cast("long")).head().getLong(0)
        // stage 1: codes-only candidate generation (deterministic
        // (adc_dist, vec_id) truncation)
        val cand = coded.filter(col("vec_id") =!= 0 && col("label") === qCell)
          .select(col("vec_id"), col("adc_dist"))
          .orderBy(col("adc_dist"), col("vec_id")).limit(50)
        // stage 2: exact distances on ≤C rows only; the query vector is a
        // 1-row bounded collect inlined as a literal (the q_knn_brute
        // discipline)
        val qv = emb(s, dir).select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
        val qvec: Seq[Long] = qv.filter(col("vec_id") === 0).head().getSeq[Long](1)
        qv.join(broadcast(cand), "vec_id")
          .select(col("vec_id"), col("adc_dist"),
            aggregate(zip_with(col("v"), typedlit(qvec),
              (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
              .as("exact_dist"))
          .orderBy(col("exact_dist"), col("vec_id")).limit(10)
      },
      Some(s"""$pqOracleCtes,
             |cand AS (
             |  SELECT q.vec_id, CAST(qd0.d + qd1.d + qd2.d + qd3.d AS BIGINT) AS adc_dist
             |  FROM q JOIN embeddings e USING (vec_id)
             |    JOIN f0 USING (vec_id) JOIN f1 USING (vec_id)
             |    JOIN f2 USING (vec_id) JOIN f3 USING (vec_id)
             |    JOIN qd0 ON qd0.j = f0.c0 JOIN qd1 ON qd1.j = f1.c1
             |    JOIN qd2 ON qd2.j = f2.c2 JOIN qd3 ON qd3.j = f3.c3
             |  WHERE q.vec_id <> 0
             |    AND e.label = (SELECT label FROM embeddings WHERE vec_id = 0)
             |  ORDER BY adc_dist, vec_id LIMIT 50),
             |qvq AS (SELECT v FROM q WHERE vec_id = 0)
             |SELECT c.vec_id, c.adc_dist,
             |  CAST(list_aggregate(list_transform(generate_series(1, len(q.v)),
             |    i -> (q.v[i] - qvq.v[i]) * (q.v[i] - qvq.v[i])), 'sum') AS BIGINT)
             |    AS exact_dist
             |FROM cand c JOIN q USING (vec_id) CROSS JOIN qvq
             |ORDER BY exact_dist, vec_id LIMIT 10""".stripMargin)),

    // ---- embedding outlier detection, exact ----
    // Quality assurance for an embedding corpus: flag vectors whose
    // squared distance to their LABEL centroid exceeds 2× the label
    // mean. All comparisons cross-multiply to integers over the
    // floor(x·64+½) quantization — d²(v)·n² = Σ_i (qᵢ·n − Sᵢ)² with
    // per-label counts n and dim sums Sᵢ — so no mean is ever
    // materialized as a float and both engines flag identical rows.
    // Scale shape: ONE explode pass builds the bounded centroid-sum
    // table (partial-aggregated; |labels|·d rows), which broadcasts
    // back; the flagging pass is in-row zip_with over the broadcast
    // arrays. Headroom: |qᵢ·n| ≤ 64·n — DECIMAL(38) is the knob past
    // ~10⁸ rows per label.
    "q_emb_outliers" -> Q(
      (s, dir) => {
        val q = emb(s, dir).select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
        val sums = q.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("label"), col("i")).agg(sum(col("x")).as("s1"))
          .groupBy(col("label"))
          .agg(transform(sort_array(collect_list(struct(col("i"), col("s1")))),
            p => p.getField("s1")).as("sarr"))
        val n = q.groupBy(col("label")).agg(count(lit(1)).as("n"))
        val d2 = q.join(broadcast(sums), "label").join(broadcast(n), "label")
          .select(col("vec_id"), col("label"), col("n"),
            aggregate(zip_with(col("v"), col("sarr"),
              (x, sv) => (x * col("n") - sv) * (x * col("n") - sv)),
              lit(0L), (acc, t) => acc + t).as("d2n2"))
        val lblStats = d2.groupBy("label")
          .agg(sum(col("d2n2")).as("tot"), count(lit(1)).as("cnt"))
        d2.join(broadcast(lblStats), "label")
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("d2n2") * col("cnt") > col("tot") * 2, 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy(col("label"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)) AS v
             |  FROM embeddings),
             |dims AS (
             |  SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM q),
             |sums AS (SELECT label, i, CAST(sum(x) AS BIGINT) AS s1
             |         FROM dims GROUP BY 1, 2),
             |cents AS (SELECT label, list(s1 ORDER BY i) AS sarr FROM sums GROUP BY 1),
             |nn AS (SELECT label, count(*) AS n FROM q GROUP BY 1),
             |d2 AS (
             |  SELECT vec_id, q.label,
             |    CAST(list_aggregate(list_transform(generate_series(1, len(v)),
             |      i -> (v[i] * n - sarr[i]) * (v[i] * n - sarr[i])), 'sum') AS BIGINT) AS d2n2
             |  FROM q JOIN cents ON q.label = cents.label
             |  JOIN nn ON q.label = nn.label),
             |st AS (SELECT label, CAST(sum(d2n2) AS BIGINT) AS tot, count(*) AS cnt
             |       FROM d2 GROUP BY 1)
             |SELECT d2.label, count(*) AS n_vecs,
             |  CAST(sum(CASE WHEN d2n2 * cnt > tot * 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM d2 JOIN st ON d2.label = st.label
             |GROUP BY d2.label ORDER BY d2.label""".stripMargin)),

    // ---- int8 symmetric quantization: the embedding-storage op ----
    // scale = 127 / max|x| per vector, q_i = ⌊x_i·scale + 0.5⌋ — 4× the
    // density of float32 for ANN at 100 TB. Entirely in-row codegen
    // (transform/aggregate over the array — no explode, no shuffle); the
    // gate reports integer digests (plain, L1, position-weighted sums), so
    // the check is float-free. floor(x+0.5) is the rounding both engines
    // compute identically; float→double widening is exact, so scale and
    // products are the same IEEE doubles on both sides.
    "q_emb_quantize" -> Q(
      (s, dir) => {
        val absmax = array_max(transform(col("embedding"),
          x => abs(x.cast("double"))))
        val scale = lit(127.0) / col("absmax")
        val qarr = transform(col("embedding"),
          (x, _) => floor(x.cast("double") * scale + lit(0.5)).cast("long"))
        def isum(arr: Column) =
          aggregate(arr, lit(0L), (acc, v) => acc + v)
        emb(s, dir)
          .withColumn("absmax", absmax)
          .filter(col("absmax") > 0)
          .withColumn("q", qarr)
          .select(col("vec_id"),
            isum(col("q")).as("qsum"),
            isum(transform(col("q"), v => abs(v))).as("l1"),
            isum(transform(col("q"),
              (q, i) => q * (i + 1).cast("long"))).as("wsum"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH $dimsSql,
              |m AS (SELECT vec_id, max(abs(x)) AS absmax FROM dims GROUP BY vec_id),
              |q AS (
              |  SELECT dims.vec_id, i,
              |         CAST(floor(x * (127.0 / absmax) + 0.5) AS BIGINT) AS qv
              |  FROM dims JOIN m USING (vec_id) WHERE absmax > 0)
              |SELECT vec_id, CAST(sum(qv) AS BIGINT) AS qsum,
              |       CAST(sum(abs(qv)) AS BIGINT) AS l1,
              |       CAST(sum(qv * i) AS BIGINT) AS wsum
              |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin))
  )
}
