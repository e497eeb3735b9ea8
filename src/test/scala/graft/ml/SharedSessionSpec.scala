package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-JVM shared-session seam: one weight copy per JVM (the
  * fix for the cores × model-size OOM a per-partition load causes on a
  * multi-core executor), and thread-safe forwards — concurrent callers
  * through ONE session must produce exactly the single-threaded
  * results.
  */
class SharedSessionSpec extends AnyFunSuite {

  private def exportModel(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft_shared_")
      .resolve("m.onnx").toString
    OnnxExport.exportMlp(Seq(
      (Array(Array(0.5, -0.25), Array(1.0, 0.75)), Array(0.1, -0.2)),
      (Array(Array(1.5), Array(-1.0)), Array(0.05))),
      Seq("f0", "f1"), path, finalSigmoid = true)
    path
  }

  test("sharedSession returns one instance per path") {
    val path = exportModel()
    val a = Scorer.sharedSession(path)
    val b = Scorer.sharedSession(path)
    assert(a eq b, "same path must share one session (one weight copy per JVM)")
    val other = exportModel()
    assert(!(Scorer.sharedSession(other) eq a))
  }

  test("concurrent forwards through one shared session are bit-identical to sequential") {
    val path = exportModel()
    val session = Scorer.sharedSession(path)
    val batches = (0 until 64).map(i =>
      Array(Array(i * 0.125 - 4.0, (i % 7) * 0.5 - 1.5))).toArray
    val sequential = batches.map(b => session.run(b)(0))
    // 16 threads × 50 rounds hammer the same session; every result must
    // equal the sequential one bit-for-bit (forward state is call-local;
    // the transpose memo races only on identical values)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 16).map { t =>
      new Thread(() => {
        var r = 0
        while (r < 50) {
          val i = (t * 50 + r) % batches.length
          if (session.run(batches(i))(0) != sequential(i)) errs.incrementAndGet()
          r += 1
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.get() == 0, s"${errs.get()} concurrent forwards diverged")
  }

  test("sharedOnnxModelFactory matches the per-partition factory's results") {
    val path = exportModel()
    val batch = Array(Array(0.5, -1.0), Array(0.0, 0.25), Array(2.0, 1.0))
    val shared = Scorer.sharedOnnxModelFactory(path)()(batch)
    val perPart = Scorer.onnxModelFactory(path)()(batch)
    assert(shared.toSeq == perPart.toSeq)
  }
}
