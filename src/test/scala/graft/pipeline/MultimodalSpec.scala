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
