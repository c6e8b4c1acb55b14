package graft.sources

import scala.collection.concurrent.TrieMap

/** Persisted Bloom-filter sidecar over a data dir — the membership sketch a
  * growing corpus keeps NEXT TO the data so that every ingest batch can
  * cheaply ask "is this content hash possibly already here?" without a
  * corpus-wide join ([[graft.operators.Dedup.bloomIncrementalDedup]]).
  *
  * Follows the same artifact lifecycle as the other stores (IndexStore,
  * GraphIndex, the band index): built once per source-content generation,
  * invalidated by the `_src_fp_<fingerprint>` marker when the source data is
  * regenerated (Tables.dirFingerprint — path- and content-token-sensitive),
  * and memoized in-process so repeated queries in one session neither
  * rebuild nor re-read it. The sketch itself is a single `bloom.bin` file
  * whose size is the `numBits` knob, NEVER a function of corpus size — the
  * bounded-metadata contract (1 MiB at the default 8 M bits).
  *
  * At 100 TB the real pipeline updates the sidecar incrementally (Bloom
  * bit-OR is associative — each ingest batch ORs its partial filter in);
  * here a stale sidecar is simply rebuilt with one map-combined pass.
  */
object BloomSidecar {

  private val memo = TrieMap.empty[String, Array[Byte]]

  private[graft] def root(dir: String): String =
    "/root/repo/data/bloom_store/" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** The sidecar bytes for (dir, name, numBits), building via `build` only
    * when no current-generation copy exists on disk or in the memo.
    */
  def ensure(dir: String, name: String, numBits: Long)(build: => Array[Byte]): Array[Byte] = {
    val path = s"${root(dir)}/${name}_$numBits"
    val key = s"$path|${graft.Tables.dirFingerprint(dir)}"
    memo.getOrElseUpdate(key, {
      val bin = new java.io.File(path, "bloom.bin")
      if (bin.exists() && IndexStore.sourceFpCurrent(path, dir))
        java.nio.file.Files.readAllBytes(bin.toPath)
      else {
        val bytes = build
        new java.io.File(path).mkdirs()
        java.nio.file.Files.write(bin.toPath, bytes)
        IndexStore.stampSourceFp(path, dir)
        bytes
      }
    })
  }

  /** In-process memo size — spec hook (mirrors Dedup.sketchMemoSize). */
  private[graft] def memoSize: Int = memo.size
}
