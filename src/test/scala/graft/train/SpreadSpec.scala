package graft.train

import graft.SparkSpec
import graft.dedup.Dedup

class SpreadSpec extends SparkSpec {

  test("spread gate: bytes, not file count (VERDICT r4 #7)") {
    val target = 32
    val maxPart = 128L << 20 // 128 MiB default maxPartitionBytes
    // small few-filed input: the classic one-hot-file case — spread
    assert(Dedup.shouldSpread(nFiles = 2, target, bytes = BigInt(5L << 20), maxPart))
    // enough files already: never repartition
    assert(!Dedup.shouldSpread(nFiles = 64, target, bytes = BigInt(5L << 20), maxPart))
    // non-file frame (0 files): leave alone
    assert(!Dedup.shouldSpread(nFiles = 0, target, bytes = BigInt(5L << 20), maxPart))
    // few-FILED but 100 TB: the scan itself splits into ≥ target
    // partitions at maxPartitionBytes — a blanket repartition would be a
    // full-corpus shuffle for nothing
    assert(!Dedup.shouldSpread(nFiles = 10, target,
      bytes = BigInt(100L * (1L << 40)), maxPart))
    // boundary: exactly target × maxPartitionBytes no longer spreads
    assert(!Dedup.shouldSpread(nFiles = 10, target,
      bytes = BigInt(maxPart) * target, maxPart))
    assert(Dedup.shouldSpread(nFiles = 10, target,
      bytes = BigInt(maxPart) * target - 1, maxPart))
  }
}
