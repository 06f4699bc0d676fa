package graft.queries

/** The ONE in-process writer-lock registry for every maintained artifact
  * family (vector, lexical, mixture, dedup). Keys are normalized absolute
  * paths, so two aliases of one index directory (`file:/x` vs `/x`,
  * `a/../b`, a trailing slash) can never mint two locks and silently void
  * the single-writer discipline — the exact race the locks exist to
  * prevent. Queries never take these locks; maintenance and appends do.
  *
  * At cluster scale this lock becomes the catalog/manifest commit (the
  * families' atomic meta rewrites already model it); in the local[*]
  * deployment shape this map IS the serialization point.
  */
private[graft] object WriterLocks {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Canonical lock key for an index directory: strip any `file:` URI
    * prefix, absolutize, collapse `.`/`..`, drop trailing separators. */
  def key(indexDir: String): String =
    java.nio.file.Paths.get(indexDir.stripPrefix("file:"))
      .toAbsolutePath.normalize.toString

  /** The lock object for an index directory. Families deliberately SHARE
    * the registry: if one directory were ever enrolled in two families,
    * their writers serialize rather than interleave — strictly safer. */
  def lockFor(indexDir: String): Object =
    locks.computeIfAbsent(key(indexDir), _ => new Object)
}
