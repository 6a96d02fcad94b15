package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** Per-row MinHash signatures — the SERVING-side twin of the SQL
  * machinery in [[graft.queries.TextQueries]] (8 seeded-md5 min
  * permutations over 3-token shingles). A single document's signature is
  * pure local compute: at ingest time a new document is signed in-flight
  * with NO shuffle, then banded and probed against the corpus index —
  * the incremental-dedup shape. Values are bit-identical to the SQL path
  * (same md5 hex strings, same ASCII-lexicographic min), so the DuckDB
  * oracle replays both sides from raw text.
  */
object MinHash {

  val NumHashes = 8

  private def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(32)
    var i = 0
    while (i < b.length) { sb.append(f"${b(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** 8-permutation signature over 3-token shingles (whitespace tokens,
    * empties kept — the [[graft.queries.TextQueries]] shingle contract);
    * null for documents with fewer than 3 tokens. */
  def signature(text: String): Array[String] = {
    val tokens = text.split(" ", -1)
    if (tokens.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val best = new Array[String](NumHashes)
    val it = tokens.iterator.sliding(3)
    while (it.hasNext) {
      val sh = it.next().mkString(" ")
      var h = 0
      while (h < NumHashes) {
        val hx = hex(md.digest((h + "|" + sh).getBytes(UTF_8)))
        if (best(h) == null || hx.compareTo(best(h)) < 0) best(h) = hx
        h += 1
      }
    }
    best
  }

  /** LSH bands of a signature: 4 bands of 2 rows, bucket = concat of the
    * band's two min-hashes (the dd_minhash_lsh_pairs banding). */
  def bands(sig: Array[String]): Seq[(Int, String)] =
    (0 until NumHashes by 2).map(h => (h / 2, sig(h) + sig(h + 1)))
}
