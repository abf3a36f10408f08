package graft.io

import java.io.File

/** Content-addressed cache keys for persisted derived indexes (postings,
  * IVF/PQ layouts). A derived index cached under a path keyed only by the
  * SOURCE DIRECTORY NAME (`dir.hashCode`) goes silently stale when the table
  * at that path is regenerated with different content — the serve query then
  * answers from the old index. Keying by a fingerprint of the source files
  * (relative path, length, mtime) makes any rewrite produce a NEW cache
  * location, so the `_SUCCESS`-exists check naturally rebuilds.
  *
  * FNV-1a over the sorted listing: cheap (pure driver-side metadata walk, no
  * data read), deterministic, and collision-irrelevant here (a collision
  * only re-uses a cache dir; the build itself is bit-reproducible). At
  * cluster scale the same discipline keys off the object-store listing
  * (etag/length/mtime) — still metadata-only.
  */
object IndexCache {

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Hex content fingerprint of everything under `dir` (file relative path,
    * length, mtime). Unsigned-hex so the key is filesystem-safe (the old
    * `math.abs(hashCode)` idiom was negative for Int.MinValue).
    *
    * A missing or empty source THROWS instead of hashing zero entries:
    * every absent path would otherwise alias to the constant FNV offset
    * basis, and a typo'd source could silently serve an index built for a
    * different table. Caveat (by design, metadata-only): a same-length
    * in-place rewrite within the filesystem's mtime resolution keeps the
    * old key — regenerate into a fresh directory (the testdata driver's
    * own discipline) when that matters.
    */
  def contentKey(dir: String): String = {
    val root = new File(dir)
    def walk(f: File): Seq[File] = {
      val kids = Option(f.listFiles()).map(_.sortBy(_.getName).toSeq)
        .getOrElse(Seq.empty)
      if (f.isDirectory) kids.flatMap(walk) else Seq(f)
    }
    val files = if (root.isDirectory) walk(root)
                else if (root.isFile) Seq(root) else Seq.empty
    require(files.nonEmpty,
      s"IndexCache source '$dir' is missing or empty — refusing to key " +
        "an index off nothing (all such paths would share one cache dir)")
    var h = FnvOffset
    def mixBytes(bs: Array[Byte]): Unit = {
      var i = 0
      while (i < bs.length) { h ^= (bs(i) & 0xffL); h *= FnvPrime; i += 1 }
    }
    val rootPath = root.getAbsolutePath
    files.foreach { f =>
      val rel = f.getAbsolutePath.stripPrefix(rootPath)
      mixBytes(s"$rel|${f.length}|${f.lastModified}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    java.lang.Long.toHexString(h)
  }

  /** Per-user cache root: a shared world-writable /tmp prefix let any local
    * user pre-create a predictable path and feed a poisoned index to
    * another user's query (and two users' builds collided). Namespacing by
    * `user.name` under the platform tmpdir keeps each user's indexes in a
    * directory only they write. On a cluster the same discipline is a
    * per-tenant object-store prefix.
    */
  private[graft] def cacheRoot: String = {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
      .stripSuffix(File.separator)
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9_.-]", "_")
    val root = new File(s"$tmp${File.separator}graft-$user")
    root.mkdirs()
    root.getAbsolutePath
  }

  /** Cache directory for a derived index: name the FAMILY (postings, serve)
    * and version, key by source content. Same source bytes → same dir
    * (reuse); any rewrite → fresh dir (rebuild).
    */
  def cacheDir(family: String, version: Int, sourceDir: String): String =
    s"$cacheRoot${File.separator}${family}_v${version}_${contentKey(sourceDir)}"

  /** Build-if-absent with ATOMIC publication: `build` writes into a private
    * temp dir which is renamed into `base` only when complete, so a
    * concurrent or crashed builder can never be observed half-written past
    * the `probe` (`_SUCCESS`-style) check. Losing a concurrent race is
    * fine — the winner's index is bit-identical (builds here are
    * deterministic), so the loser just discards its copy.
    */
  def ensureBuilt(base: String, probe: String)(build: String => Unit): Unit = {
    if (!new File(probe).exists) {
      val tmp = new File(
        base + ".build-" + java.util.UUID.randomUUID().toString.take(8))
      def rmRf(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmRf)); f.delete(); ()
      }
      // a failed or interrupted build must not orphan its private temp dir
      // next to the cache — remove it on ANY non-published exit
      val published =
        try {
          build(tmp.getAbsolutePath)
          tmp.renameTo(new File(base))
        } finally {
          // after a successful rename tmp no longer exists; anything left
          // is a failed build or a lost publish race — sweep it
          if (tmp.exists) rmRf(tmp)
        }
      if (!published && !new File(probe).exists)
        throw new IllegalStateException(
          s"could not publish index build into '$base' and no complete " +
            "index is present — remove the stale directory and retry")
    }
  }
}
