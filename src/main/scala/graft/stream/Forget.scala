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
  * then appends ONE audit line to the stream's `FORGET_AUDIT` log naming
  * every surface's commit (each family's own META_HISTORY/HISTORY seq —
  * the per-family logs stay the source of detail; the audit line is the
  * index into them) and returns per-surface counts.
  *
  * Failure contract: each leg is an independently atomic commit (its
  * family's pointer flip), applied in the order above, so a crash
  * mid-forget leaves a PREFIX of the legs applied — re-running the same
  * forget is idempotent on every leg (redaction retries are no-ops,
  * family deletes semi-join against live rows, the mixture leg is guarded
  * by the caller supplying the same doc set) and the audit line is only
  * written when every requested leg committed.
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

  /** Drive every requested leg in order; ONE audit line when all have
    * committed. Returns per-surface counts plus the audit seq and the
    * commit tokens the line records. */
  def apply(s: SparkSession, h: StreamHandle,
      t: Targets): Map[String, Any] = {
    require(t.mixtureDir.isEmpty == t.mixtureDocs.isEmpty,
      "mixture delete needs BOTH the stats dir and the forgotten docs' " +
        "(source, text) rows — counts keep no per-doc state")
    require(t.vectorDir.isEmpty || t.vecIds.nonEmpty,
      "vector leg requested with no vec_ids")
    require((t.lexicalDir.isEmpty && t.dedupDir.isEmpty) || t.docIds.nonEmpty,
      "lexical/dedup leg requested with no doc_ids")
    import s.implicits._
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
      val r = graft.queries.Pipeline.deleteMixtureStats(s, t.mixtureDocs.get, d)
      out("mixture_deleted_docs") = r("deleted_docs")
      commits += s"mixture:$d@seq=${graft.queries.Pipeline.mixHistory(d).size}"
    }
    require(commits.nonEmpty, "forget with nothing to forget")
    val seq = h.appendForgetAudit(
      (Seq(s"idx=${t.idx.size}", s"users=${t.users.size}",
        s"vec_ids=${t.vecIds.size}",
        s"doc_ids=${t.docIds.size}") ++ commits).mkString(" "))
    out("audit_seq") = seq
    out("commits") = commits.toVector
    out.toMap
  }
}
