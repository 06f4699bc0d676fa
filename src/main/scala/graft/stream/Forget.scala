package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The COMPOSED right-to-be-forgotten verb (round 16, verdict r15 item 2).
  *
  * Round 15 completed the takedown story surface by surface — store-of-
  * record redaction plus one delete verb per derived index family — but a
  * real forget request then required the operator to invoke five verbs in
  * the right order with no single record tying them together. This object
  * is that orchestration: ONE call drives
  *
  *   1. `StreamHandle.redactEvents` (the store of record FIRST — from
  *      this commit on, no replay can re-derive the forgotten payloads;
  *      optional rematerialize converges the module tables in the same
  *      step),
  *   2. `Similarity.deleteFromVectorIndex`,
  *   3. `Retrieval.deleteFromLexicalIndex` (df/stats corrected),
  *   4. `Dedup.deleteFromDedupIndex`,
  *   5. `Pipeline.deleteMixtureStats` (the negated monoid batch),
  *
  * bracketed by the stream's `FORGET_AUDIT` intent ledger (round 17,
  * verdict r16 item 2): a `pending` line with the targets lands BEFORE
  * leg 1, and the `committed` line naming every surface's commit (each
  * family's own META_HISTORY/HISTORY seq — the per-family logs stay the
  * source of detail; the audit line is the index into them) closes the
  * same seq after the last leg. Returns per-surface counts.
  *
  * Failure contract: each leg is an independently atomic commit (its
  * family's pointer flip), applied in the order above, so a crash
  * mid-forget leaves a PREFIX of the legs applied — and the open
  * `pending` intent makes that state DISCOVERABLE from the ledger
  * (round 16 recorded completions only, so an operator had to KNOW to
  * re-run). Re-running the same forget resumes the open intent's seq
  * and is idempotent on every leg: redaction retries are no-ops, the
  * vector/lexical/dedup deletes semi-join against live rows, and the
  * mixture leg — a monoid append with no membership state, which a
  * blind re-run WOULD double-negate — carries a takedown token keyed to
  * the intent seq into its META_HISTORY commit, so a replay provably
  * no-ops (r16 ADVICE).
  *
  * Reference seam: the reference has no composed takedown (no redaction,
  * no index deletes — this engine added both); the audit-line discipline
  * follows the families' META_HISTORY (newline-prefixed, crc-stamped).
  */
object Forget {

  /** What to forget, and where. `users` resolves to every event those
    * users authored (the shape a real takedown arrives in) and unions
    * with the explicit `idx` set in ONE redaction commit. `docIds`
    * feeds BOTH the lexical and dedup legs (one takedown id space — the
    * `documents` schema); `vecIds` feeds the vector leg; `mixtureDocs`
    * carries the forgotten docs' own (source, text) rows because the
    * mixture stats keep no per-doc state (the takedown feed has them by
    * definition). */
  case class Targets(
      idx: Seq[Long] = Seq.empty,
      users: Seq[String] = Seq.empty,
      vecIds: Seq[Long] = Seq.empty,
      docIds: Seq[Long] = Seq.empty,
      vectorDir: Option[String] = None,
      lexicalDir: Option[String] = None,
      dedupDir: Option[String] = None,
      mixtureDir: Option[String] = None,
      mixtureDocs: Option[DataFrame] = None,
      rematerialize: Boolean = false)

  /** The targets line the intent ledger records — also the resume key:
    * a re-run of an interrupted forget matches its open pending intent
    * by this exact text. The `key` token digests the ACTUAL sorted
    * target values (not just their counts): a DIFFERENT takedown that
    * happens to share counts and dirs must open its own intent, not
    * resume a crashed one — resuming would hand it the crashed
    * takedown's mixture replay token and silently skip its own mixture
    * delete. Digested rather than inlined so a million-doc takedown
    * does not put a million ids on one audit line. The mixture docs'
    * CONTENT digests too (an order-independent one-aggregate Spark job,
    * O(takedown), no collect) — a mixture leg's identity is its doc
    * frame, and the id sets alone can be empty for a mixture-only
    * takedown. */
  private def targetsSummary(t: Targets): String = {
    val legs = Seq(
      if (t.idx.nonEmpty || t.users.nonEmpty)
        Some("redact" + (if (t.rematerialize) "+remat" else "")) else None,
      t.vectorDir.map(d => s"vector:$d"),
      t.lexicalDir.map(d => s"lexical:$d"),
      t.dedupDir.map(d => s"dedup:$d"),
      t.mixtureDir.map(d => s"mixture:$d")).flatten
    val mixDigest = t.mixtureDocs.map { df =>
      import org.apache.spark.sql.functions._
      df.select(xxhash64(col("source"), col("text"))
          .cast("decimal(38,0)").as("h"))
        .agg(coalesce(sum(col("h")), lit(0)).cast("string"))
        .head().getString(0)
    }.getOrElse("-")
    val canonical = Seq(
      t.idx.sorted.mkString(","), t.users.sorted.mkString(","),
      t.vecIds.sorted.mkString(","), t.docIds.sorted.mkString(","),
      mixDigest, legs.mkString(",")).mkString("|")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    Seq(s"idx=${t.idx.size}", s"users=${t.users.size}",
      s"vec_ids=${t.vecIds.size}", s"doc_ids=${t.docIds.size}",
      s"key=$key", s"legs=${legs.mkString(",")}").mkString(" ")
  }

  /** Drive every requested leg in order inside one pending→committed
    * intent. Returns per-surface counts plus the audit seq and the
    * commit tokens the committed line records. */
  def apply(s: SparkSession, h: StreamHandle,
      t: Targets): Map[String, Any] = {
    require(t.mixtureDir.isEmpty == t.mixtureDocs.isEmpty,
      "mixture delete needs BOTH the stats dir and the forgotten docs' " +
        "(source, text) rows — counts keep no per-doc state")
    require(t.vectorDir.isEmpty || t.vecIds.nonEmpty,
      "vector leg requested with no vec_ids")
    require((t.lexicalDir.isEmpty && t.dedupDir.isEmpty) || t.docIds.nonEmpty,
      "lexical/dedup leg requested with no doc_ids")
    val targets = targetsSummary(t)
    require(t.idx.nonEmpty || t.users.nonEmpty || t.vectorDir.nonEmpty ||
      t.lexicalDir.nonEmpty || t.dedupDir.nonEmpty || t.mixtureDir.nonEmpty,
      "forget with nothing to forget")
    import s.implicits._
    // the INTENT: pending before leg 1 — a crash anywhere below leaves
    // this line open in the ledger. A re-run of the SAME takedown (the
    // documented recovery) resumes the open intent instead of opening a
    // second one, so the mixture replay token stays stable across the
    // retry and the ledger reads one takedown, not two.
    val seq = h.forgetAudit.reverse.collectFirst {
      case (q, "pending", tg) if tg == targets => q
    }.getOrElse(h.beginForgetAudit(targets))
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    val commits = scala.collection.mutable.ArrayBuffer.empty[String]
    if (t.idx.nonEmpty || t.users.nonEmpty) {
      val r = h.redactFor(t.idx, t.users, rematerialize = t.rematerialize)
      out("redacted") = r("redacted")
      commits += s"stream:redact_seq=${h.redactionExposure._2}" +
        (if (t.rematerialize) "+remat" else "")
    }
    t.vectorDir.foreach { d =>
      val r = graft.queries.Similarity.deleteFromVectorIndex(s, t.vecIds, d)
      out("vector_tombstones") = r("tombstones")
      commits += s"vector:$d@seq=${
        graft.queries.Similarity.manifestHistory(d).size}"
    }
    t.lexicalDir.foreach { d =>
      val r = graft.queries.Retrieval.deleteFromLexicalIndex(
        s, t.docIds.toDF("doc_id"), d)
      out("lexical_deleted") = r("deleted")
      commits += s"lexical:$d@seq=${graft.queries.Retrieval.lexHistory(d).size}"
    }
    t.dedupDir.foreach { d =>
      val r = graft.queries.Dedup.deleteFromDedupIndex(
        s, t.docIds.toDF("doc_id"), d)
      out("dedup_deleted") = r("deleted")
      commits += s"dedup:$d@seq=${graft.queries.Dedup.dedupHistory(d).size}"
    }
    t.mixtureDir.foreach { d =>
      // the replay token: keyed to THIS intent's seq (and the stream —
      // one mixture dir can serve several), so a resumed re-run no-ops
      // a mixture leg that already committed, while a genuinely new
      // takedown of the same docs (new intent, new seq) negates again
      val r = graft.queries.Pipeline.deleteMixtureStats(
        s, t.mixtureDocs.get, d,
        takedownToken = Some(s"${h.id}#forget#$seq"))
      out("mixture_deleted_docs") = r("deleted_docs")
      commits += s"mixture:$d@seq=${graft.queries.Pipeline.mixHistory(d).size}"
    }
    h.completeForgetAudit(seq, (targets +: commits).mkString(" "))
    out("audit_seq") = seq
    out("commits") = commits.toVector
    out.toMap
  }
}
