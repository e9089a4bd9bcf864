package graft

import org.apache.spark.sql.functions._
import graft.llmops.{Codecs, Multimodal}

/** Perceptual average-hash image dedup: identity, near-identity under
  * small perturbation, and the banded candidate join's exactness. */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def ppmRow(id: Long, rgb: Array[Byte], w: Int, h: Int) =
    (id, "image", Codecs.Ppm.encode(w, h, rgb), w, h, 0, 0)

  private def mediaDf(rows: Seq[(Long, String, Array[Byte], Int, Int, Int, Int)]) =
    spark.createDataFrame(rows.toDF(
      "media_id", "kind", "payload", "width", "height", "sample_rate", "n_frames").rdd,
      Multimodal.mediaSchema)

  test("identical images hash identically; a light perturbation stays near") {
    val rnd = new scala.util.Random(3)
    val base = Array.tabulate(16 * 16 * 3)(_ => (rnd.nextInt(256) - 128).toByte)
    val perturbed = base.clone()
    perturbed(5) = (perturbed(5) + 4).toByte // one subpixel nudged
    val far = Array.tabulate(16 * 16 * 3)(i => (~base(i)).toByte) // inverted
    val df = mediaDf(Seq(ppmRow(1, base, 16, 16), ppmRow(2, base.clone(), 16, 16),
      ppmRow(3, perturbed, 16, 16), ppmRow(4, far, 16, 16)))
    val h = Multimodal.perceptualHash(df)
      .as[(Long, Long)].collect().toMap
    assert(h(1) == h(2))
    assert(java.lang.Long.bitCount(h(1) ^ h(3)) <= 4)
    assert(java.lang.Long.bitCount(h(1) ^ h(4)) > 16)
    val pairs = Multimodal.phashNearDups(
        Multimodal.perceptualHash(df), maxDist = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  private def wavRow(id: Long, samples: Array[Short]) =
    (id, "audio", Codecs.Wav.encode(16000, samples), 0, 0, 16000, 0)

  test("audio hash: identical clips match; gain rescale preserves it; noise breaks it") {
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate[Short](16000)(i =>
      ((math.sin(i / 50.0) * 8000 + rnd.nextInt(800)).toShort))
    val gained = base.map(s => (s / 2).toShort) // uniform gain change
    val noise = Array.tabulate[Short](16000)(_ => (rnd.nextInt(16000) - 8000).toShort)
    val df = mediaDf(Seq(wavRow(1, base), wavRow(2, base.clone()),
      wavRow(3, gained), wavRow(4, noise)))
    val h = Multimodal.audioHash(df).as[(Long, Long)].collect().toMap
    assert(h(1) == h(2))
    // halving every sample halves every window mean AND the clip mean —
    // each comparison is preserved up to int16 truncation jitter
    assert(java.lang.Long.bitCount(h(1) ^ h(3)) <= 4)
    assert(java.lang.Long.bitCount(h(1) ^ h(4)) > 10)
  }

  test("banded candidates equal brute force at the pigeonhole bound") {
    val rnd = new scala.util.Random(9)
    val hashes = (1L to 200L).map(i => (i, rnd.nextLong())).toDF("media_id", "phash")
    val got = Multimodal.phashNearDups(hashes, maxDist = 16)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val h = (1L to 200L).zip(hashes.orderBy("media_id").select("phash").as[Long].collect()).toMap
    val want = (for {
      a <- 1L to 200L; b <- (a + 1) to 200L
      d = java.lang.Long.bitCount(h(a) ^ h(b)) if d <= 16
    } yield (a, b, d)).toSet
    assert(got == want)
  }
}
