package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale guards for the dedup ladder: the hot-band population cap and
  * the reliable-checkpoint path of the label-propagation loop. */
class DedupScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("capBands drops over-populated band keys and keeps organic ones") {
    import spark.implicits._
    // synthetic hot cluster: one band key shared by 5 docs, one by 2
    val bands = (
      (1L to 5L).map(id => (id, 0, "hot")) ++ Seq((10L, 0, "cold"), (11L, 0, "cold"))
    ).toDF("doc_id", "band", "band_key")
    val capped = Dedup.capBands(bands, maxBandPopulation = 4)
    val keys = capped.select("band_key").distinct().as[String].collect().toSet
    assert(keys === Set("cold"), "hot band key should be dropped whole")
    assert(capped.count() === 2)
    // cap above every population: nothing dropped
    assert(Dedup.capBands(bands, maxBandPopulation = 5).count() === 7)
  }

  test("wide signatures (k>8) draw real slices from enough seeded digests") {
    // regression pin for the digest-overrun bug: the builder once claimed
    // two md5s yield 16 32-bit slices (they yield 8) — k>8 silently read
    // past the 64-hex concat into empty substrings, so every m8..m15
    // would have been a degenerate empty-string minimum
    val sigs = Dedup.minhashSignatures(spark, dir, k = 16).limit(50).collect()
    assert(sigs.nonEmpty)
    for (row <- sigs; i <- 0 until 16) {
      val m = row.getString(row.fieldIndex(s"m$i"))
      assert(m != null && m.length == 8 && m.matches("[0-9a-f]{8}"),
        s"m$i = '$m' is not an 8-hex slice")
    }
    // distinct digests per seed: the four seeded hash families must not
    // collapse into one (seed prefix actually reaches the hash input)
    val r0 = sigs.head
    val slices = (0 until 16).map(i => r0.getString(r0.fieldIndex(s"m$i")))
    assert(slices.distinct.size > 4, s"suspiciously repetitive slices: $slices")
  }

  test("confirmedPairs builds the candidate pipeline once per (session, dir) and stays cached") {
    val before = Dedup.pairsBuilds.get()
    val first = Dedup.confirmedPairs(spark, dir)
    val second = Dedup.confirmedPairs(spark, dir)
    assert(second eq first, "second call must serve the session-cached stage")
    assert(Dedup.pairsBuilds.get() <= before + 1, "pipeline rebuilt despite the cache")
    assert(first.storageLevel.useMemory, "pair stage must be persisted")
    // six downstream queries share the stage: their pair sets must be
    // consistent views (filter of the same scored set)
    val all = first.count()
    val confirmed = Dedup.ngramJaccard(spark, dir).count()
    assert(confirmed <= all && all > 0)
  }

  test("simhash stage is computed once per (session, dir) and shared by q34/q35") {
    val before = Dedup.simhashBuilds.get()
    val fp1 = Dedup.simhash(spark, dir).collect()
    val fp2 = Dedup.simhash(spark, dir).collect()
    assert(fp1.sameElements(fp2))
    assert(Dedup.simhashBuilds.get() <= before + 1, "fingerprints recomputed despite the stage cache")
    // q35 consumes the same stage — no extra build
    val mid = Dedup.simhashBuilds.get()
    Dedup.simhashNearDup(spark, dir).count()
    assert(Dedup.simhashBuilds.get() === mid, "simhashNearDup rebuilt the fingerprint stage")
  }

  test("minhash signature stage is computed once per (session, dir) and shared with the pair build") {
    val before = Dedup.minhashBuilds.get()
    val est1 = Dedup.minhashLsh(spark, dir).collect()
    val est2 = Dedup.minhashLsh(spark, dir).collect()
    assert(est1.sameElements(est2))
    assert(Dedup.minhashBuilds.get() <= before + 1, "signatures recomputed despite the stage cache")
    // the pair pipeline consumes the same stage — no extra build
    val mid = Dedup.minhashBuilds.get()
    Dedup.confirmedPairs(spark, dir).count()
    assert(Dedup.minhashBuilds.get() === mid, "confirmedPairs rebuilt the signature stage")
  }

  test("the propagation loop self-provisions a RELIABLE checkpoint dir and honors an explicit one") {
    // any entry point reaching the BSP loop must end up with a reliable
    // checkpoint dir (localCheckpoint dies with an executor on a cluster)
    val auto = Dedup.clusters(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.nonEmpty, "expected at least one near-dup cluster in testdata")
    assert(spark.sparkContext.getCheckpointDir.isDefined,
      "clusters() must self-provision a reliable checkpoint dir")
    // an explicitly configured dir is honored and actually written to
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val explicit = Dedup.clusters(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(explicit === auto)
    assert(java.nio.file.Files.list(ckpt).count() > 0, "no checkpoint data written")
  }

  test("entry points provision a reliable checkpoint dir by default") {
    graft.GraftSession.ensureCheckpointDir(spark)
    assert(spark.sparkContext.getCheckpointDir.isDefined,
      "Bench/Verify sessions must run the fault-tolerant checkpoint path")
    // idempotent: an already-configured dir is honored, not replaced
    val before = spark.sparkContext.getCheckpointDir
    graft.GraftSession.ensureCheckpointDir(spark)
    assert(spark.sparkContext.getCheckpointDir === before)
  }
}
