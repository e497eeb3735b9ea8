package graft.ml

/** JNI onnxruntime adapter for the [[Scorer]] seam — the factory a real
  * deployment plugs into [[Scorer.ExternalModelScorer]] /
  * [[Scorer.ExternalEmbedder]] in place of the pure-JVM
  * [[Scorer.onnxModelFactory]] when an `onnxruntime` jar is dropped on
  * the executor classpath.
  *
  * Written against the DOCUMENTED public Java API of onnxruntime
  * (package `ai.onnxruntime`: `OrtEnvironment.getEnvironment()`,
  * `env.createSession(path)`, `OnnxTensor.createTensor(env, float[][])`,
  * `session.run(Map[String, OnnxTensor])`, `result.get(0).getValue()`),
  * reached via REFLECTION so this class compiles and ships in a
  * container with no such jar — it is inert until the jar appears. The
  * swap is factory-body-only by construction: the returned closure has
  * the exact `() => Array[Array[Double]] => …` shape the scorer seam
  * already takes, so none of the mapPartitions plumbing, batch budgeting
  * ([[Scorer.budgetedBatch]]), or schema handling changes.
  *
  * `runtimePackage` exists for the spec: a fake runtime with the same
  * class/method surface (`graft.fakeort`) drives the ENTIRE adapter —
  * reflection lookups, batch marshalling to `float[][]`, result
  * unmarshalling, tensor/result `close()` — proving the jar drop
  * changes nothing but the package string. Production callers leave the
  * default.
  *
  * Graphs exported by [[OnnxExport]] declare FLOAT inputs (torch's
  * default export dtype — `OnnxExport.DataTypeFloat`), so batches are
  * marshalled `Double → Float` before tensor creation; outputs come
  * back as `float[]` / `float[][]` per the same convention.
  */
object OrtModelFactory {

  val DefaultRuntimePackage = "ai.onnxruntime"

  /** True when an onnxruntime (or compatible) jar is loadable — the
    * deploy-time check a pipeline runs before choosing this factory
    * over the pure-JVM [[Scorer.onnxModelFactory]]. */
  def runtimeAvailable(runtimePackage: String = DefaultRuntimePackage): Boolean =
    try { Class.forName(s"$runtimePackage.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException => false }

  /** One open session + the reflective handles needed per batch. Built
    * once per partition inside the factory closure (the contract slot
    * where [[Scorer.onnxModelFactory]] parses the model file). */
  private final class Session(runtimePackage: String, modelPath: String) {
    private val envCls = Class.forName(s"$runtimePackage.OrtEnvironment")
    private val tensorCls = Class.forName(s"$runtimePackage.OnnxTensor")
    val env: AnyRef = envCls.getMethod("getEnvironment").invoke(null)
    val session: AnyRef = envCls
      .getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    private val sessionCls = session.getClass
    // the graph's real input name, from the session itself — callers
    // never guess it (getInputNames(): java.util.Set[String])
    val inputName: String = {
      val names = sessionCls.getMethod("getInputNames").invoke(session)
        .asInstanceOf[java.util.Set[String]]
      require(!names.isEmpty, s"$modelPath: session declares no inputs")
      names.iterator().next()
    }
    private val createTensor = tensorCls.getMethod("createTensor",
      envCls, classOf[Object])
    private val runMethod = sessionCls.getMethod("run", classOf[java.util.Map[_, _]])

    /** One forward pass; returns `result.get(0).getValue()` with tensor
      * and result closed (both are AutoCloseable holding native memory —
      * leaking them per batch OOMs off-heap long before the JVM heap
      * notices). */
    def run(batch: Array[Array[Double]]): AnyRef = {
      val floats: Array[Array[Float]] = batch.map(_.map(_.toFloat))
      val tensor = createTensor.invoke(null, env, floats)
      try {
        val result = runMethod.invoke(session,
          java.util.Collections.singletonMap(inputName, tensor))
        try {
          val first = result.getClass.getMethod("get", classOf[Int])
            .invoke(result, Integer.valueOf(0))
          first.getClass.getMethod("getValue").invoke(first)
        } finally result match {
          case c: AutoCloseable => c.close()
          case _ => ()
        }
      } finally tensor match {
        case c: AutoCloseable => c.close()
        case _ => ()
      }
    }
  }

  /** Scorer factory: one `Double` per row, [[Scorer.onnxModelFactory]]'s
    * exact contract. Accepts `float[]` (shape `[n]`) or single-column
    * `float[][]` (shape `[n,1]`) outputs. */
  def scorerFactory(modelPath: String,
                    runtimePackage: String = DefaultRuntimePackage)
      : () => Array[Array[Double]] => Array[Double] =
    () => {
      val s = new Session(runtimePackage, modelPath)
      (batch: Array[Array[Double]]) => s.run(batch) match {
        case v: Array[Float] => v.map(_.toDouble)
        case m: Array[Array[Float]] =>
          require(m.forall(_.length == 1),
            s"scorer graph returned width-${m.headOption.map(_.length).getOrElse(0)} rows; expected scalar")
          m.map(_(0).toDouble)
        case other => throw new IllegalStateException(
          s"unexpected scorer output ${other.getClass}")
      }
    }

  /** Embedder factory: one `Array[Float]` vector per row,
    * [[Scorer.onnxEmbedderFactory]]'s exact contract. */
  def embedderFactory(modelPath: String,
                      runtimePackage: String = DefaultRuntimePackage)
      : () => Array[Array[Double]] => Array[Array[Float]] =
    () => {
      val s = new Session(runtimePackage, modelPath)
      (batch: Array[Array[Double]]) => s.run(batch) match {
        case m: Array[Array[Float]] => m
        case other => throw new IllegalStateException(
          s"unexpected embedder output ${other.getClass}")
      }
    }
}
