package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE md5-uniform convention — the one deterministic randomness source
  * every sampler, splitter, and sketch in this engine draws from (the
  * replayable replacement for a PRNG, SURVEY §7.4). Centralized so the
  * hash-width / endpoint / seed choices live in exactly one place, each
  * mirrored by one oracle spelling ([[graft.operators.Curation.hexUSql]]
  * on the SQL side):
  *
  *  - [[md5U32]]      ⇔ `conv(substr(md5(x), 1, 8), 16, 10)`
  *  - [[md5Uniform]]  ⇔ `u32 / 2^32`            ∈ [0, 1)  (thresholds)
  *  - [[md5UniformOpen]] ⇔ `(u32 + 0.5) / 2^32` ∈ (0, 1)  (log-safe:
  *    Gumbel keys, KMV minima — never exactly 0 or 1)
  *  - [[md5Bucket16]] ⇔ `substr(md5(x), 1, 1)`  (16-way split key)
  */
object HashFunctions {

  /** uint32 from the first 8 md5 hex chars of `c` (cast to string). */
  def md5U32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic uniform in [0, 1). */
  def md5Uniform(c: Column): Column =
    md5U32(c).cast("double") / lit(4294967296.0)

  /** Deterministic uniform in (0, 1) — both endpoints excluded, so
    * `ln`/`ln(ln)` transforms stay finite. */
  def md5UniformOpen(c: Column): Column =
    (md5U32(c).cast("double") + lit(0.5)) / lit(4294967296.0)

  /** First md5 hex char ('0'..'f') — the 16-way deterministic split
    * key (`< "8"` = the train half, `=== "0"` = a 1/16 held-out set). */
  def md5Bucket16(c: Column): Column =
    substring(md5(c.cast("string")), 1, 1)
}
