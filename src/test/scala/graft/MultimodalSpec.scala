package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal column plumbing: payload/metadata schema, deterministic
  * stubbed decode over real binary batches. */
class MultimodalSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  test("withPayload: binary payload + typed metadata struct") {
    val df = Multimodal.withPayload(Tables(spark, sf, "documents"))
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.schema("meta").dataType == Multimodal.mediaMetaType)
    val row = df.selectExpr("meta.n_bytes", "octet_length(payload)")
      .head()
    assert(row.getLong(0) == row.getInt(1).toLong)
  }

  test("sampleFrames: strided fixed-size slices reassemble the payload prefix") {
    val payloads = Multimodal.withPayload(Tables(spark, sf, "documents"))
    val framed = Multimodal.sampleFrames(payloads, frameBytes = 16,
      stride = 1)
    val row = framed.join(payloads, "doc_id")
      .selectExpr("frames", "payload", "n_frames").head()
    val frames = row.getSeq[Array[Byte]](0)
    val payload = row.getAs[Array[Byte]](1)
    assert(frames.map(_.length).sum == payload.length)
    assert(java.util.Arrays.equals(frames.flatten.toArray, payload))
    // stride 2 keeps every other frame
    val strided = Multimodal.sampleFrames(payloads, 16, 2)
      .selectExpr("n_frames").head().getInt(0)
    assert(strided == (row.getInt(2) + 1) / 2)
  }

  test("decodeStub: fixed feature schema, deterministic values") {
    val payloads = Multimodal.withPayload(Tables(spark, sf, "documents"))
    val f1 = Multimodal.decodeStub(spark, payloads).orderBy("doc_id")
      .collect()
    val f2 = Multimodal.decodeStub(spark, payloads).orderBy("doc_id")
      .collect()
    assert(f1.nonEmpty)
    assert(f1.toSeq == f2.toSeq, "stub decode is deterministic")
    assert(Multimodal.decodeStub(spark, payloads).schema ==
      Multimodal.featuresType)
    val r = f1.head
    assert(r.getInt(1) >= 16 && r.getInt(1) < 32) // fake width bounds
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0)
  }
}
