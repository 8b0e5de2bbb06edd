package graft.ops

/** The ONE corpus-identity hash: every tmpdir artifact family (model
  * stores, gate stores, truth caches, matview gate roots, version-keyed
  * cache keys) derives corpus identity from this single function, so a
  * future change to identity derivation (e.g. canonicalizing symlinks)
  * happens once — eleven call sites computing their own
  * `MurmurHash3.stringHash(absolutePath)` had already drifted into a
  * maintenance hazard before this existed. */
private[graft] object CorpusId {
  def hash(dir: String): Int =
    scala.util.hashing.MurmurHash3.stringHash(
      new java.io.File(dir).getAbsolutePath)

  def hex(dir: String): String = java.lang.Integer.toHexString(hash(dir))
}
