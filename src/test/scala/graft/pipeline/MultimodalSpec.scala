package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("media table carries binary column with typed metadata") {
    val media = Multimodal.mediaTable(Tables.load(spark, TestSpark.sf, "documents"))
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    assert(schema("mime").dataType.typeName == "string")
  }

  test("frame sampling yields ceil(n_frames/stride) frames per video") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val feats = Multimodal.features(docs)
      .filter(org.apache.spark.sql.functions.col("mime") === "video/fake")
      .select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val frames = Multimodal.sampleFrames(docs, stride = 10)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames.keySet == feats.keySet)
    frames.foreach { case (id, n) =>
      assert(n == math.ceil(feats(id) / 10.0).toLong, s"doc $id")
    }
  }

  test("decode is deterministic and preserves row count") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val f1 = Multimodal.features(docs).orderBy("doc_id").collect()
    val f2 = Multimodal.features(docs).orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.length == docs.count())
    // byte_len matches utf-8 length of source text
    val first = f1.head
    assert(first.getAs[Long]("byte_len") > 0)
    assert(first.getAs[Int]("width") >= 16)
  }
}
