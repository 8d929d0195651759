package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Audio

/** Specs for the audio pipeline: REAL WAV encode/decode through the
  * JDK's javax.sound.sampled codec, the windowed fingerprint, and the
  * silence-run segmentation — each pinned against the clip formula's
  * closed form (the same arithmetic the q361–q363 DuckDB oracles
  * evaluate). */
class AudioSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  test("WAV round trip: real encode then real decode recovers exact samples") {
    val samples = Array(0, 1, -1, 32767, -32768, 5000, -5000, 123, -456)
    val wav = Audio.encodeWav(samples)
    // a real RIFF container, not raw PCM
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val d = Audio.decodeAudio(wav).get
    assert(d.sampleRate === Audio.SampleRate)
    assert(d.channels === 1)
    assert(d.samples.toSeq === samples.toSeq)
  }

  test("decode falls back to None on non-audio payloads") {
    assert(Audio.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Audio.decodeAudio(Array.empty[Byte]).isEmpty)
    // RIFF magic with corrupt body must not kill the task either
    assert(Audio.decodeAudio("RIFFxxxxWAVEjunk".getBytes("US-ASCII")).isEmpty)
  }

  test("rendered clip matches the closed form the oracles evaluate") {
    val seed = 0x00a5_a5a5_a5a5_a5a5L // known bit pattern, 56-bit
    val s = Audio.renderClip(seed, 0)
    assert(s.length === Audio.ClipSamples)
    // window 0 always active: +A on even, -A on odd
    assert(s(0) === Audio.Amp && s(1) === -Audio.Amp)
    // windows 57..63 always silent
    assert((57 * Audio.WindowSamples until Audio.ClipSamples).forall(s(_) == 0))
    // window w in 1..56 carries seed bit w-1
    assert(s(1 * Audio.WindowSamples) === Audio.Amp) // bit 0 of 0xa5 = 1
    assert(s(2 * Audio.WindowSamples) === 0) // bit 1 = 0
    // variant flips exactly one window in 1..56
    val v = Audio.renderClip(seed, 2)
    val diffWindows = (0 until Audio.Windows).count { w =>
      (0 until Audio.WindowSamples).exists(k =>
        s(w * Audio.WindowSamples + k) != v(w * Audio.WindowSamples + k))
    }
    assert(diffWindows === 1)
  }

  test("fingerprint: planted Hamming distances are 1 and 2, cross-seed far") {
    val seed = 0x0012_3456_789a_bcdeL
    def fp(variant: Int): Long =
      Audio.audioFingerprint(Audio.decodeAudio(
        Audio.encodeWav(Audio.renderClip(seed, variant))).get.samples)
    val base = fp(0)
    assert(java.lang.Long.bitCount(base ^ fp(1)) === 1)
    assert(java.lang.Long.bitCount(base ^ fp(2)) === 1)
    assert(java.lang.Long.bitCount(fp(1) ^ fp(3)) === 2)
    // fingerprint = the active-window bitmap: bit 0 (window 0) is set,
    // bits 57..63 clear, bits 1..56 echo the seed
    assert((base & 1L) === 1L)
    assert((base >>> 57) === 0L)
    assert(((base >> 1) & ((1L << 56) - 1)) === seed)
    val other = Audio.audioFingerprint(Audio.decodeAudio(
      Audio.encodeWav(Audio.renderClip(0x00fe_dcba_9876_5432L, 0))).get.samples)
    assert(java.lang.Long.bitCount(base ^ other) > 3)
  }

  test("q361 census: all rows real-decode with formula-exact integer stats") {
    val rows = Audio.audioDecodeCensus(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("real_decode"), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("n_samples") === Audio.ClipSamples.toLong)
      assert(r.getAs[Int]("sample_rate") === Audio.SampleRate)
      val sumAbs = r.getAs[Long]("sum_abs")
      val nPos = r.getAs[Long]("n_pos")
      // both are multiples of one shared active-window count kb in [1,58]
      assert(sumAbs % 60000L === 0L)
      val kb = sumAbs / 60000L
      assert(kb >= 1L && kb <= 58L)
      assert(nPos === kb * 6L)
    }
  }

  test("q362 near-dup: exactly the planted within-group pairs") {
    val rows = Audio.audioNearDup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      val d = r.getAs[Int]("dist")
      assert(a / 4 === b / 4, s"cross-group pair ($a,$b)")
      assert(d === (if (a % 4 == 0 || b % 4 == 0) 1 else 2))
    }
    // every group of 4 present in the corpus yields all 6 pairs
    val docs = graft.Tables.load(spark, sf, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val fullGroups = docs.groupBy(_ / 4).count(_._2.length == 4)
    val pairsByGroup = rows.map(_.getAs[Long]("doc_a") / 4).groupBy(identity)
    assert(pairsByGroup.count(_._2.length == 6) === fullGroups)
  }

  test("q381: audio probe distinguishes base and variant-2 delta docs") {
    val rows = Audio.audioIncrementalDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val d = r.getLong(0)
      val groupMates = (d / 4 * 4 until d / 4 * 4 + 4)
        .filter(m => m != d && docs.contains(m))
      assert(r.getLong(1) === groupMates.size.toLong, s"doc $d match count")
      if (groupMates.nonEmpty) {
        // best = smallest distance, then LARGEST doc: a base delta
        // (d%4==0, every sibling at dist 1) best-matches d+3; a
        // variant-2 delta (d%20==10) best-matches its base d-2, the
        // only dist-1 sibling
        assert(r.getInt(3) === 1, s"doc $d best_dist")
        val expected = if (d % 4 == 0) groupMates.max else d - 2
        assert(r.getLong(2) === expected, s"doc $d best_match")
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3), s"doc $d must be clean")
      }
    }
    // both delta shapes are actually present on the gate corpus
    assert(rows.exists(_.getLong(0) % 20 === 0L))
    assert(rows.exists(_.getLong(0) % 20 === 10L))
  }

  test("q382: persisted audio index is band-partitioned and verdict-identical to q381") {
    val inline = Audio.audioIncrementalDedup(spark, sf).collect()
    val tmp = java.nio.file.Files.createTempDirectory("graft_audidx").toString
    try {
      Audio.saveAudioIndex(spark, sf, tmp)
      val bandDirs = new java.io.File(s"$tmp/bands").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(bandDirs.toSeq === Seq("band=0", "band=1", "band=2", "band=3"),
        "index must be partitioned by band for probe-side pruning")
      val fromIdx = Audio.audioIndexProbe(spark, sf, tmp).collect()
      assert(fromIdx.map(_.toString).toSeq === inline.map(_.toString).toSeq)
      assert(fromIdx.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q363 silence runs: bitmap-derived run structure matches decode") {
    val rows = Audio.audioSilenceRuns(spark, sf).collect()
    assert(rows.nonEmpty)
    val specs = Audio.clipSpecs(spark, sf).collect()
      .map(s => s.doc_id -> s).toMap
    rows.foreach { r =>
      val s = specs(r.getAs[Long]("doc_id"))
      val amps = Audio.windowAmps(s.seed, s.variant)
      val bits = amps.map(a => if (a > 0) '1' else '0').mkString
      val runs = bits.split('0').filter(_.nonEmpty)
      assert(r.getAs[Int]("n_windows") === Audio.Windows)
      assert(r.getAs[Long]("n_silent") === bits.count(_ == '0').toLong)
      assert(r.getAs[Int]("n_active_runs") === runs.length)
      assert(r.getAs[Int]("longest_active_run") ===
        (if (runs.isEmpty) 0 else runs.map(_.length).max))
    }
  }
}
