package graft.fakeort

/** Test-only fake of the documented `ai.onnxruntime` Java surface the
  * [[graft.ml.OrtModelFactory]] adapter reflects against — same class
  * names, same method signatures, same AutoCloseable ownership — backed
  * by the pure-JVM [[graft.ml.OnnxSession]] over the SAME model file.
  * Driving the adapter through this package proves the real-jar swap is
  * factory-body-only: every reflective lookup, the float[][] batch
  * marshalling, the result unmarshalling, and the per-batch close()
  * discipline run for real; only the package string differs.
  */
class OrtEnvironment private[fakeort] () {
  def createSession(modelPath: String): OrtSession = new OrtSession(modelPath)
}

object OrtEnvironment {
  private val instance = new OrtEnvironment
  def getEnvironment(): OrtEnvironment = instance
}

class OrtSession private[fakeort] (modelPath: String) {
  private val inner = graft.ml.OnnxSession.load(modelPath)

  def getInputNames(): java.util.Set[String] = {
    val s = new java.util.LinkedHashSet[String]()
    inner.inputNames.foreach(s.add)
    s
  }

  def run(inputs: java.util.Map[String, OnnxTensor]): OrtResult = {
    require(inputs.size() == 1, s"fake run expects one input, got ${inputs.size()}")
    val batch = inputs.values().iterator().next().data
    // the adapter marshals Double→Float; the fake runtime (like the real
    // one) computes in the tensor's dtype, so back through double here
    val doubles = batch.map(_.map(_.toDouble))
    new OrtResult(inner.runMatrix(doubles).map(_.map(_.toFloat)))
  }
}

class OnnxTensor private[fakeort] (val data: Array[Array[Float]])
    extends AutoCloseable {
  override def close(): Unit = FakeOrt.closedTensors.incrementAndGet()
}

object OnnxTensor {
  def createTensor(env: OrtEnvironment, data: Object): OnnxTensor = {
    FakeOrt.createdTensors.incrementAndGet()
    new OnnxTensor(data.asInstanceOf[Array[Array[Float]]])
  }
}

class OrtResult private[fakeort] (value: Array[Array[Float]])
    extends AutoCloseable {
  FakeOrt.createdResults.incrementAndGet()
  def get(i: Int): OnnxValue = {
    require(i == 0, s"fake result only has output 0, asked for $i")
    new OnnxValue(value)
  }
  override def close(): Unit = FakeOrt.closedResults.incrementAndGet()
}

class OnnxValue private[fakeort] (value: Array[Array[Float]]) {
  def getValue(): Object = value
}

/** Close-discipline counters (leaking native tensors per batch OOMs
  * off-heap — the spec pins that the adapter closes everything). */
object FakeOrt {
  val createdTensors = new java.util.concurrent.atomic.AtomicLong
  val closedTensors = new java.util.concurrent.atomic.AtomicLong
  val createdResults = new java.util.concurrent.atomic.AtomicLong
  val closedResults = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit = Seq(createdTensors, closedTensors,
    createdResults, closedResults).foreach(_.set(0))
}
