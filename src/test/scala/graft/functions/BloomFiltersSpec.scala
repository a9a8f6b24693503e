package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom membership: the one-sided-error contract (NO false negatives —
  * the property that makes a Bloom PREfilter before an exact semi-join
  * result-invariant) plus fpp sanity and the codegen probe path. */
class BloomFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(lo: Long, hi: Long) = (lo to hi).toDF("h")
    .select(xxhash64(col("h")).as("sh"))

  test("bloom: zero false negatives over every inserted key") {
    val in = hashes(1, 5000)
    val handle = BloomFilters.build(in, col("sh"), fpp = 0.01)
    val missed = in.filter(!BloomFilters.mightContain(spark, handle, col("sh")))
      .count()
    assert(missed === 0L, "a Bloom filter must never reject an inserted key")
  }

  test("bloom: measured fpp on disjoint probes stays near nominal") {
    val handle = BloomFilters.build(hashes(1, 5000), col("sh"), fpp = 0.01)
    val probes = hashes(1000000, 1100000) // disjoint key range
    val hits = probes.filter(BloomFilters.mightContain(spark, handle, col("sh")))
      .count()
    val fpp = hits.toDouble / 100001
    assert(fpp < 0.05, s"nominal 1% fpp measured at $fpp — sizing is broken")
    val (m, k, load) = BloomFilters.describe(handle)
    assert(m % 64 === 0 && k >= 1)
    assert(load > 0.0 && load < 0.6, s"load factor $load outside sane range")
  }

  test("bloom: null hashes are excluded at build and probe is null-safe") {
    val in = Seq(Some(1L), None, Some(2L)).toDF("sh")
    val handle = BloomFilters.build(in, col("sh"))
    // null probe → null (filter drops it), not a crash or a hit
    val n = in.filter(BloomFilters.mightContain(spark, handle, col("sh"))).count()
    assert(n === 2L)
  }

  test("bloom: unknown handle fails loudly at analysis, not silently empty") {
    val e = intercept[Exception] {
      hashes(1, 10).filter(
        BloomFilters.mightContain(spark, "no-such-handle", col("sh"))).count()
    }
    assert(e.getMessage.contains("unknown bloom handle"))
  }

  test("bloom: build is partitioning-invariant (bit_or reduce is commutative)") {
    val a = BloomFilters.build(hashes(1, 2000).repartition(1), col("sh"),
      fpp = 0.01, expectedN = 2000)
    val b = BloomFilters.build(hashes(1, 2000).repartition(7), col("sh"),
      fpp = 0.01, expectedN = 2000)
    val pa = BloomFilters.describe(a)
    val pb = BloomFilters.describe(b)
    assert(pa === pb, "same keys, same sizing → identical bit population")
    // and the two filters agree on an arbitrary probe set
    val probes = hashes(1, 4000)
    val da = probes.filter(BloomFilters.mightContain(spark, a, col("sh"))).count()
    val db = probes.filter(BloomFilters.mightContain(spark, b, col("sh"))).count()
    assert(da === db)
  }

  test("bloom: destroy releases the handle (resolve fails; double-destroy no-ops)") {
    val in = hashes(1, 100)
    val handle = BloomFilters.build(in, col("sh"), fpp = 0.01)
    // usable before destroy
    assert(in.filter(BloomFilters.mightContain(spark, handle, col("sh")))
      .count() === 100L)
    BloomFilters.destroy(handle)
    // registry entry gone — a later plan must fail loudly, not serve
    // destroyed bits
    val e = intercept[Exception] {
      in.filter(BloomFilters.mightContain(spark, handle, col("sh"))).count()
    }
    assert(e.getMessage.contains("unknown bloom handle"))
    BloomFilters.destroy(handle) // idempotent
  }
}
