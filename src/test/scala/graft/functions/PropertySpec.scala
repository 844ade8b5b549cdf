package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks (seeded random trials) for the hand-written
  * kernels — the pieces with the most room for off-by-one /
  * heap-invariant bugs. Pure JVM (no SparkSession), so they run in
  * milliseconds.
  */
class PropertySpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260812L)

  test("TopKBuffer equals sort-based top-k for 200 random inputs") {
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(20)
      val xs = List.fill(n)(rnd.nextDouble() * 2e9 - 1e9)
      val top = new TopKBuffer(k, ascending = false)
      xs.foreach(top.insert)
      assert(top.sorted.toSeq == xs.sorted(Ordering[Double].reverse).take(k))
      val bot = new TopKBuffer(k, ascending = true)
      xs.foreach(bot.insert)
      assert(bot.sorted.toSeq == xs.sorted.take(k))
    }
  }

  test("TopKBuffer merge equals top-k of the concatenation") {
    (1 to 100).foreach { _ =>
      val k = 1 + rnd.nextInt(10)
      val a = List.fill(rnd.nextInt(40))(rnd.nextDouble() * 2e6 - 1e6)
      val b = List.fill(rnd.nextInt(40))(rnd.nextDouble() * 2e6 - 1e6)
      val ba = new TopKBuffer(k, ascending = false)
      a.foreach(ba.insert)
      val bb = new TopKBuffer(k, ascending = false)
      b.foreach(bb.insert)
      ba.mergeFrom(bb)
      assert(ba.sorted.toSeq ==
        (a ++ b).sorted(Ordering[Double].reverse).take(k))
    }
  }

  test("multimodal synthesizers always produce parseable format bytes") {
    (1 to 200).foreach { _ =>
      val seed = rnd.nextLong()
      val (w, h) = graft.pipeline.Multimodal.parsePpm(
        graft.pipeline.Multimodal.synthPpm(seed))
      assert(w >= 4 && h >= 4, s"seed $seed")
      val (rate, n) = graft.pipeline.Multimodal.parseWav(
        graft.pipeline.Multimodal.synthWav(seed))
      assert(rate == 8000 && n >= 64, s"seed $seed")
      val (vw, vh, offs) = graft.pipeline.Multimodal.parseY4m(
        graft.pipeline.Multimodal.synthY4m(seed))
      assert(vw == 8 && vh == 8 && offs.nonEmpty && offs.length <= 121,
        s"seed $seed")
    }
  }

  test("Importer.hdkType maps every documented name and rejects junk") {
    import org.apache.spark.sql.types._
    val cases = Seq("int8" -> ByteType, "int16" -> ShortType,
      "int" -> IntegerType, "int64" -> LongType, "fp32" -> FloatType,
      "fp64" -> DoubleType, "bool" -> BooleanType, "text" -> StringType,
      "date" -> DateType, "timestamp" -> TimestampType,
      "decimal(10,2)" -> DecimalType(10, 2))
    cases.foreach { case (n, t) =>
      assert(graft.sources.Importer.hdkType(n) == t, n)
    }
    intercept[Exception](graft.sources.Importer.hdkType("not_a_type"))
  }
}
