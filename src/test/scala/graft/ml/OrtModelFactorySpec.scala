package graft.ml

import graft.SparkSpec
import graft.fakeort.FakeOrt

/** Pins the JNI onnxruntime swap seam: [[OrtModelFactory]] driven
  * through the fake `graft.fakeort` runtime (same documented class +
  * method surface as `ai.onnxruntime`) must score/embed identically to
  * the pure-JVM [[Scorer.onnxModelFactory]] path over the SAME exported
  * model file, through the SAME [[Scorer.ExternalModelScorer]] /
  * [[Scorer.ExternalEmbedder]] plumbing. A real jar drop changes only
  * the package string — nothing else in the pipeline moves.
  */
class OrtModelFactorySpec extends SparkSpec {
  import spark.implicits._

  private val FakePkg = "graft.fakeort"
  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory("graft_ort_").resolve(name).toString

  private def featureDf = Seq(
    (1L, 0.5, -1.0, 2.0), (2L, 0.0, 0.25, -0.75),
    (3L, 1.5, 1.0, 0.5), (4L, -2.0, 0.125, 1.0)
  ).toDF("id", "f0", "f1", "f2")

  test("runtime availability: absent by default, present via the fake package") {
    assert(!OrtModelFactory.runtimeAvailable(),
      "no onnxruntime jar ships in this container — if this fails, one appeared " +
        "and the factory default path should be exercised directly")
    assert(OrtModelFactory.runtimeAvailable(FakePkg))
  }

  test("scorerFactory through the fake runtime == pure-JVM onnxModelFactory, factory-body-only swap") {
    val path = tmp("mlp.onnx")
    // 3-feature → 2-hidden → scalar sigmoid MLP: exercises MatMul/Add/
    // Relu/Sigmoid through both sessions
    OnnxExport.exportMlp(Seq(
      (Array(Array(0.5, -0.25), Array(1.0, 0.75), Array(-0.5, 0.25)), Array(0.1, -0.2)),
      (Array(Array(1.5), Array(-1.0)), Array(0.05))),
      Seq("f0", "f1", "f2"), path, finalSigmoid = true)
    FakeOrt.reset()
    val cols = Seq("f0", "f1", "f2")
    val viaOrt = new Scorer.ExternalModelScorer(
      OrtModelFactory.scorerFactory(path, FakePkg), cols)
      .score(featureDf).select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaJvm = new Scorer.ExternalModelScorer(
      Scorer.onnxModelFactory(path), cols)
      .score(featureDf).select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaOrt.keySet == viaJvm.keySet)
    viaOrt.foreach { case (id, s) =>
      // the adapter marshals Double→Float at the tensor boundary (the
      // exported graph declares FLOAT inputs, as the real runtime would
      // see); agreement is to float precision, not bit-exact
      assert(math.abs(s - viaJvm(id)) < 1e-5,
        s"id $id: ort $s vs jvm ${viaJvm(id)}")
    }
  }

  test("embedderFactory through the fake runtime == pure-JVM onnxEmbedderFactory") {
    val path = tmp("linmap.onnx")
    OnnxExport.exportLinearMap(
      Array(Array(1.0, 0.0), Array(0.5, -0.5), Array(0.0, 2.0)),
      Array(0.25, -0.125), Seq("f0", "f1", "f2"), path)
    val cols = Seq("f0", "f1", "f2")
    def collect(factory: () => Array[Array[Double]] => Array[Array[Float]]) =
      new Scorer.ExternalEmbedder(factory, cols, dim = 2)
        .score(featureDf).select("id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val viaOrt = collect(OrtModelFactory.embedderFactory(path, FakePkg))
    val viaJvm = collect(Scorer.onnxEmbedderFactory(path))
    assert(viaOrt.keySet == viaJvm.keySet)
    viaOrt.foreach { case (id, v) =>
      assert(v.length == 2)
      v.lazyZip(viaJvm(id)).foreach((a, b) =>
        assert(math.abs(a - b) < 1e-5f, s"id $id: $v vs ${viaJvm(id)}"))
    }
  }

  test("adapter closes every tensor and result it creates (native-memory discipline)") {
    val path = tmp("close.onnx")
    OnnxExport.exportLinearMap(Array(Array(1.0)), Array(0.0), Seq("f0"), path)
    FakeOrt.reset()
    val df = (1 to 100).map(i => (i.toLong, i * 0.5)).toDF("id", "f0")
      .repartition(4)
    new Scorer.ExternalEmbedder(
      OrtModelFactory.embedderFactory(path, FakePkg), Seq("f0"), dim = 1,
      batchSize = 8)
      .score(df).count()
    assert(FakeOrt.createdTensors.get() > 1, "expected multiple batches")
    assert(FakeOrt.closedTensors.get() == FakeOrt.createdTensors.get(),
      s"leaked tensors: ${FakeOrt.createdTensors.get() - FakeOrt.closedTensors.get()}")
    assert(FakeOrt.closedResults.get() == FakeOrt.createdResults.get(),
      s"leaked results: ${FakeOrt.createdResults.get() - FakeOrt.closedResults.get()}")
  }
}
