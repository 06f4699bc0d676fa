package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table. Everything is a narrow projection + per-row
  * expression pipeline (whole-stage codegen, no UDFs, no shuffle except
  * where aggregation is the point), so it scales linearly with input
  * splits: at 100 TB these are embarrassingly parallel scans.
  *
  * Cross-engine determinism: token features use md5 (identical hex in Spark
  * and DuckDB); ratios are single IEEE double divisions on exact integer
  * inputs, which are bit-identical in both engines.
  */
object TextAnalysis {

  /** Deterministic doc-split hash + the train/val/test rule — shared by
    * q_split_sample and the funnel (Pipeline) so the ratios can never
    * desynchronize between the standalone operator and the composition. */
  private[queries] val docSplitHash: Column =
    conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
  private[queries] def splitOf(h: Column): Column =
    when(h % 10 < 8, "train").when(h % 10 === 8, "val").otherwise("test")

  // NOT spread wholesale: these gates are map-only scans + one final
  // order (q_quality_gopher's plan is pinned to exactly that shape).
  // The one per-position kernel (winnow) spreads at its call site.
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  val all: Map[String, Q] = Map(

    // ---- token counting: whitespace tokens + distinct + BPE-ish subunits ----
    // The regex token count approximates BPE pre-tokenization: runs of
    // word chars or single non-space symbols.
    "q_text_tokens" -> Q(
      (s, dir) =>
        docs(s, dir).select(
          col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(toks(col("text")))).cast("long").as("n_distinct"),
          size(split(trim(col("text")), "[a-z0-9]+")).minus(1).cast("long").as("n_word_runs"),
          length(col("text")).cast("long").as("n_chars_m"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             |  len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
             |  len(regexp_split_to_array(trim(text), '[a-z0-9]+')) - 1 AS n_word_runs,
             |  length(text) AS n_chars_m
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- quality scoring: length/stopword/diversity ratios ----
    "q_text_quality" -> Q(
      (s, dir) => {
        val t = toks(col("text"))
        val nTok = size(t).cast("double")
        val nStop = size(filter(t, x => x.isin(stopwords.map(lit(_)): _*))).cast("double")
        val nDis = size(array_distinct(t)).cast("double")
        val avgLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok
        // no rounding: all inputs are exact integers, so each division /
        // fixed-order double expression is bit-identical across engines
        docs(s, dir).select(
          col("doc_id"),
          (nStop / nTok).as("stopword_ratio"),
          (nDis / nTok).as("distinct_ratio"),
          avgLen.as("avg_token_len"),
          (nStop / nTok * 0.3 + nDis / nTok * 0.4 +
            least(nTok, lit(100.0)) / 100.0 * 0.3).as("quality_score"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id,
              |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
              |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
              |         x -> x IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) AS n_stop,
              |    CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE) AS n_dis,
              |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS n_alpha
              |  FROM documents)
              |SELECT doc_id,
              |  n_stop / n_tok AS stopword_ratio,
              |  n_dis / n_tok AS distinct_ratio,
              |  n_alpha / n_tok AS avg_token_len,
              |  n_stop / n_tok * 0.3 + n_dis / n_tok * 0.4 +
              |        least(n_tok, 100.0) / 100.0 * 0.3 AS quality_score
              |FROM f ORDER BY doc_id""".stripMargin)),

    // ---- language ID: marker-token scores + deterministic argmax ----
    "q_text_langid" -> Q(
      (s, dir) => {
        val t = toks(col("text"))
        def score(ws: Seq[String]): Column =
          size(filter(t, x => x.isin(ws.map(lit(_)): _*))).cast("long")
        val sEn = score(Seq("the", "of", "and"))
        val sDe = score(Seq("der", "und", "das"))
        val sEs = score(Seq("el", "la", "y"))
        val sFr = score(Seq("le", "et", "les"))
        docs(s, dir).select(
          col("doc_id"), col("lang"),
          sEn.as("s_en"), sDe.as("s_de"), sEs.as("s_es"), sFr.as("s_fr"),
          when(sEn >= greatest(sDe, sEs, sFr), "en")
            .when(sDe >= greatest(sEs, sFr), "de")
            .when(sEs >= sFr, "es")
            .otherwise("fr").as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, lang,
             |    regexp_split_to_array(trim(text), '\s+') AS t
             |  FROM documents),
             |sc AS (
             |  SELECT doc_id, lang,
             |    len(list_filter(t, x -> x IN ('the','of','and'))) AS s_en,
             |    len(list_filter(t, x -> x IN ('der','und','das'))) AS s_de,
             |    len(list_filter(t, x -> x IN ('el','la','y'))) AS s_es,
             |    len(list_filter(t, x -> x IN ('le','et','les'))) AS s_fr
             |  FROM f)
             |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
             |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
             |       WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
             |       WHEN s_es >= s_fr THEN 'es'
             |       ELSE 'fr' END AS pred_lang
             |FROM sc ORDER BY doc_id""".stripMargin)),

    // ---- document fingerprinting: md5 of normalized text + 60-bit prefix ----
    "q_text_fingerprint" -> Q(
      (s, dir) => {
        val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        val fp = md5(norm)
        docs(s, dir).select(
          col("doc_id"),
          fp.as("fp"),
          conv(substring(fp, 1, 15), 16, 10).cast("long").as("fp60"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             |  ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp60
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- winnowing fingerprints: rolling 5-gram hashes, min per window ----
    // The plagiarism/near-dup fingerprint scheme: every 5-char window rolls
    // a 60-bit hash (computed at scan time), consecutive positions group
    // into windows of 4, and each window keeps its MINIMUM hash — a
    // document is represented by O(len/4) stable fingerprints that survive
    // local edits outside the touched windows. Map-side explode + one
    // groupBy; selecting distinct fingerprints bounds the output.
    "q_text_winnow" -> Q(
      (s, dir) => {
        val win = 4
        Tables.spread(docs(s, dir))
          .select(col("doc_id"), trim(col("text")).as("t"))
          .filter(length(col("t")) >= 5)
          .select(col("doc_id"),
            explode(sequence(lit(1), length(col("t")) - 4)).as("i"),
            col("t"))
          .select(col("doc_id"), expr(s"CAST((i - 1) DIV $win AS BIGINT)").as("w"),
            graft.functions.VectorExpressions
              .md5_60(s, col("t").substr(col("i"), lit(5))).as("h"))
          .groupBy(col("doc_id"), col("w"))
          .agg(min(col("h")).as("fp"))
          .orderBy(col("doc_id"), col("w"))
      },
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |    unnest(generate_series(1, length(trim(text)) - 4)) AS i,
             |    trim(text) AS t
             |  FROM documents WHERE length(trim(text)) >= 5),
             |hashed AS (
             |  SELECT doc_id, CAST((i - 1) // 4 AS BIGINT) AS w,
             |    ('0x' || substr(md5(substr(t, i, 5)), 1, 15))::BIGINT AS h
             |  FROM sh)
             |SELECT doc_id, w, min(h) AS fp FROM hashed
             |GROUP BY 1, 2 ORDER BY doc_id, w""".stripMargin)),

    // ---- deterministic train/val/test split by content-stable hash ----
    // The pipeline staple: each doc's split is a pure function of its id's
    // md5 (stable across runs, machines, and engines — no RNG, no state),
    // ~80/10/10 by hash range. Per-split counts + exact length stats prove
    // the assignment is identical in both engines.
    "q_split_sample" -> Q(
      (s, dir) => {
        docs(s, dir)
          .select(col("doc_id"), length(col("text")).cast("long").as("len"),
            docSplitHash.as("h"))
          .select(splitOf(col("h")).as("split"), col("len"))
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum(col("len")).as("total_chars"),
            min(col("len")).as("min_len"), max(col("len")).as("max_len"))
          .orderBy(col("split"))
      },
      Some("""WITH assigned AS (
             |  SELECT CASE WHEN h % 10 < 8 THEN 'train'
             |              WHEN h % 10 = 8 THEN 'val' ELSE 'test' END AS split,
             |         len FROM (
             |    SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
             |           length(text) AS len
             |    FROM documents))
             |SELECT split, count(*) AS n, CAST(sum(len) AS BIGINT) AS total_chars,
             |  min(len) AS min_len, max(len) AS max_len
             |FROM assigned GROUP BY 1 ORDER BY split""".stripMargin)),

    // ---- composite quality gate (Gopher-style rules) ----
    // The multi-rule document filter every web-scale corpus pass applies
    // (word-count bounds, mean-word-length bounds, max-word-length cap)
    // with a per-rule verdict so downstream can audit WHY a doc dropped,
    // not just that it did. All comparisons are INTEGER arithmetic (the
    // mean-word-length band [3,10] is tested as n_alpha between 3·n_words
    // and 10·n_words), so the gate hash carries no float tail at all.
    // Map-only scan: at 100 TB this is embarrassingly parallel and fully
    // codegen'd; the only shuffle is the gate's final order.
    "q_quality_gopher" -> Q(
      (s, dir) => {
        val t = toks(col("text"))
        val nWords = size(t).cast("long")
        val nAlpha = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
        val maxW = array_max(transform(t, w => length(w))).cast("long")
        docs(s, dir).select(
          col("doc_id"), nWords.as("n_words"), maxW.as("max_word_len"),
          (nWords >= 20 && nWords <= 80).as("ok_word_count"),
          (nAlpha >= nWords * 3 && nAlpha <= nWords * 10).as("ok_mean_wlen"),
          (maxW <= 15).as("ok_max_wlen"))
          .withColumn("keep",
            col("ok_word_count") && col("ok_mean_wlen") && col("ok_max_wlen"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
             |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_alpha,
             |    CAST(list_max(list_transform(regexp_split_to_array(trim(text), '\s+'),
             |         w -> length(w))) AS BIGINT) AS max_word_len
             |  FROM documents)
             |SELECT doc_id, n_words, max_word_len,
             |  n_words >= 20 AND n_words <= 80 AS ok_word_count,
             |  n_alpha >= n_words * 3 AND n_alpha <= n_words * 10 AS ok_mean_wlen,
             |  max_word_len <= 15 AS ok_max_wlen,
             |  (n_words >= 20 AND n_words <= 80)
             |    AND (n_alpha >= n_words * 3 AND n_alpha <= n_words * 10)
             |    AND max_word_len <= 15 AS keep
             |FROM f ORDER BY doc_id""".stripMargin))
  )
}
