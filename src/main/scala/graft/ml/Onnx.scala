package graft.ml

/** ONNX export + pure-JVM session for the trained scoring head (Q7) — the
  * engine's re-expression of the reference's fine-tuned scorer artifact
  * (`/root/reference/tabsketchfm/tabsketchfm_finetune.py:64-117`).
  *
  * The artifact written by [[OnnxExport.exportLogistic]] is a REAL ONNX
  * `ModelProto` (protobuf wire format per the public onnx.proto schema;
  * opset 13): graph `features ─MatMul coef─ Add intercept ─ Sigmoid─
  * score`, DOUBLE tensors for bit-parity with the MLlib pipeline. Any
  * standard onnxruntime loads it unchanged. This container ships no
  * onnxruntime jar (offline build), so [[OnnxSession]] is the in-repo
  * session: it PARSES the protobuf back (no shared state with the writer
  * beyond the public format) and executes the graph nodes as data. The
  * per-partition factory slot ([[Scorer.onnxModelFactory]]) is exactly
  * where a JNI-backed `OrtSession` would open instead.
  */
object OnnxExport {

  import Proto._

  val OpsetVersion = 13L
  /** Opset for graphs using LayerNormalization (an official op since 17). */
  val OpsetVersionLn = 17L
  val DataTypeDouble = 11 // TensorProto.DataType.DOUBLE
  val DataTypeInt64 = 7   // TensorProto.DataType.INT64

  // ---- shared protobuf constructors (one definition for all exporters) ----
  private def tensorMsg(name: String, dims: Seq[Long], data: Array[Double]): Array[Byte] = {
    concat(lenDelim(1, packedVarints(dims)), varintField(2, DataTypeDouble),
      lenDelim(10, packedDoubles(data)), stringField(8, name))
  }
  /** INT64 tensor (Reshape shape inputs, axis lists carried as tensors). */
  private def tensorMsgI64(name: String, dims: Seq[Long], data: Seq[Long]): Array[Byte] = {
    concat(lenDelim(1, packedVarints(dims)), varintField(2, DataTypeInt64),
      lenDelim(7, packedVarints(data)), stringField(8, name))
  }
  // AttributeProto: name=1, f=2(float), i=3(int64), ints=8, type=20
  // (FLOAT=1, INT=2, INTS=7 per the public onnx.proto enum)
  private def attrI(name: String, v: Long): Array[Byte] =
    concat(stringField(1, name), varintField(20, 2L), varintField(3, v))
  private def attrF(name: String, v: Float): Array[Byte] =
    concat(stringField(1, name), varintField(20, 1L),
      fixed32Field(2, java.lang.Float.floatToIntBits(v)))
  private def attrInts(name: String, vs: Seq[Long]): Array[Byte] =
    concat(stringField(1, name), varintField(20, 7L),
      lenDelim(8, packedVarints(vs)))
  private def nodeMsg(op: String, ins: Seq[String], out: String,
                      attrs: Seq[Array[Byte]] = Nil): Array[Byte] = {
    concat((ins.map(stringField(1, _)) :+ stringField(2, out) :+
      stringField(4, op)) ++ attrs.map(lenDelim(5, _)): _*)
  }
  private def valueInfoMsg(name: String, dims: Seq[Either[String, Long]]): Array[Byte] = {
    val shape = concat(dims.map {
      case Left(param) => lenDelim(1, stringField(2, param))
      case Right(v)    => lenDelim(1, varintField(1, v))
    }: _*)
    concat(stringField(1, name),
      lenDelim(2, lenDelim(1, concat(varintField(1, DataTypeDouble), lenDelim(2, shape)))))
  }

  /** Assemble + write one ModelProto: ir_version 8, producer "graft",
    * opset, the graph, and the feature column order in metadata_props. */
  private def writeModel(path: String, graphName: String,
                         nodes: Seq[Array[Byte]], inits: Seq[Array[Byte]],
                         input: (String, Seq[Either[String, Long]]),
                         output: (String, Seq[Either[String, Long]]),
                         features: Seq[String],
                         opset: Long = OpsetVersion): Unit = {
    val graph = concat(
      (nodes.map(lenDelim(1, _)) ++ Seq(stringField(2, graphName)) ++
        inits.map(lenDelim(5, _)) ++ Seq(
        lenDelim(11, valueInfoMsg(input._1, input._2)),
        lenDelim(12, valueInfoMsg(output._1, output._2)))): _*)
    val modelBytes = concat(
      varintField(1, 8L), stringField(2, "graft"), lenDelim(7, graph),
      lenDelim(8, varintField(2, opset)),
      lenDelim(14, concat(stringField(1, "features"),
        stringField(2, features.mkString(",")))))
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, modelBytes)
  }

  /** Export the pipeline's logistic stage as an ONNX binary. Same fail-fast
    * validations as the JSON exporter: finite weights, a VectorAssembler
    * supplying the feature order, widths consistent. */
  def exportLogistic(model: org.apache.spark.ml.PipelineModel, path: String): Unit = {
    val lr = model.stages.collectFirst {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel => m
    }.getOrElse(throw new IllegalArgumentException(
      "exportLogistic needs a LogisticRegressionModel stage"))
    val feats = model.stages.collectFirst {
      case a: org.apache.spark.ml.feature.VectorAssembler => a.getInputCols.toSeq
    }.getOrElse(Seq.empty)
    val coefs = lr.coefficients.toArray
    require(coefs.forall(java.lang.Double.isFinite) &&
      java.lang.Double.isFinite(lr.intercept),
      "exportLogistic: non-finite coefficient/intercept (diverged fit?)")
    require(feats.nonEmpty, "exportLogistic: no VectorAssembler stage")
    require(feats.length == coefs.length,
      s"exportLogistic: ${feats.length} features vs ${coefs.length} coefficients")

    val d = coefs.length
    writeModel(path, "graft_logistic",
      nodes = Seq(
        nodeMsg("MatMul", Seq("features", "coef"), "z0"),
        nodeMsg("Add", Seq("z0", "intercept"), "z1"),
        nodeMsg("Sigmoid", Seq("z1"), "score")),
      inits = Seq(
        tensorMsg("coef", Seq(d.toLong, 1L), coefs),
        tensorMsg("intercept", Seq(1L), Array(lr.intercept))),
      input = ("features", Seq(Left("N"), Right(d.toLong))),
      output = ("score", Seq(Left("N"), Right(1L))),
      features = feats)
  }

  /** Export an MLP head as ONNX — the reference's `SimpleModel` baseline
    * shape (`SimpleModel.py:3-16`: Linear → ReLU → Linear), generalized
    * to any depth: MatMul+Add per layer, Relu between layers, optional
    * Sigmoid on the output (scoring vs embedding head). Each layer is
    * `(weights[d_in][d_out], bias[d_out])`. */
  def exportMlp(layers: Seq[(Array[Array[Double]], Array[Double])],
                features: Seq[String], path: String,
                finalSigmoid: Boolean = false): Unit = {
    require(layers.nonEmpty, "exportMlp: at least one layer")
    require(layers.head._1.length == features.length,
      s"exportMlp: ${features.length} features vs ${layers.head._1.length} first-layer rows")
    layers.sliding(2).foreach {
      case Seq((w1, b1), (w2, _)) =>
        require(w1.head.length == b1.length && b1.length == w2.length,
          "exportMlp: layer width mismatch")
      case _ => ()
    }
    layers.foreach { case (w, b) =>
      require(w.forall(r => r.length == b.length && r.forall(java.lang.Double.isFinite)) &&
        b.forall(java.lang.Double.isFinite), "exportMlp: ragged or non-finite layer")
    }
    val d = features.length
    val kOut = layers.last._2.length
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val inits = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var cur = "features"
    layers.zipWithIndex.foreach { case ((w, b), i) =>
      val last = i == layers.length - 1
      inits += tensorMsg(s"w$i", Seq(w.length.toLong, b.length.toLong), w.flatten)
      inits += tensorMsg(s"b$i", Seq(b.length.toLong), b)
      nodes += nodeMsg("MatMul", Seq(cur, s"w$i"), s"mm$i")
      val addOut = if (last && !finalSigmoid) "out" else s"a$i"
      nodes += nodeMsg("Add", Seq(s"mm$i", s"b$i"), addOut)
      cur = addOut
      if (!last) {
        nodes += nodeMsg("Relu", Seq(cur), s"r$i"); cur = s"r$i"
      } else if (finalSigmoid) {
        nodes += nodeMsg("Sigmoid", Seq(cur), "out"); cur = "out"
      }
    }
    writeModel(path, "graft_mlp", nodes.toSeq, inits.toSeq,
      input = ("features", Seq(Left("N"), Right(d.toLong))),
      output = ("out", Seq(Left("N"), Right(kOut.toLong))),
      features = features)
  }

  /** Export a linear projection head `x·W + b` as ONNX — the Q1/Q6
    * embedding-head shape (`extract_embeddings.py:16-73`,
    * `embedding_search.py:29-37`): pooled per-column features in,
    * `k`-dim embedding out. `weights` is row-major `[d][k]`. */
  def exportLinearMap(weights: Array[Array[Double]], bias: Array[Double],
                      features: Seq[String], path: String): Unit = {
    val d = weights.length
    require(d > 0 && d == features.length,
      s"exportLinearMap: ${features.length} features vs $d weight rows")
    val k = weights(0).length
    require(weights.forall(_.length == k) && bias.length == k,
      "exportLinearMap: ragged weights or bias width mismatch")
    require(weights.forall(_.forall(java.lang.Double.isFinite)) &&
      bias.forall(java.lang.Double.isFinite), "exportLinearMap: non-finite weight")
    writeModel(path, "graft_linear_map",
      nodes = Seq(
        nodeMsg("MatMul", Seq("features", "weights"), "z0"),
        nodeMsg("Add", Seq("z0", "bias"), "embedding")),
      inits = Seq(
        tensorMsg("weights", Seq(d.toLong, k.toLong), weights.flatten),
        tensorMsg("bias", Seq(k.toLong), bias)),
      input = ("features", Seq(Left("N"), Right(d.toLong))),
      output = ("embedding", Seq(Left("N"), Right(k.toLong))),
      features = features)
  }

  /** All weights of the 1-layer multi-head transformer encoder +
    * sigmoid classification head [[exportMiniEncoder]] writes — the E4
    * shape (`/root/reference/tabsketchfm/transformer_bert.py:88-224`
    * encoder layer; `extract_embeddings.py:16-117` checkpoint-driven
    * scoring) at toy dimensions. `wq/wk/wv(h)(d)(e)` are per-head
    * projections `[dModel][dHead]`; `wo` the output projection
    * `[dModel][dModel]`; `w1/w2` the FFN (Sigmoid activation); g1/b1 and
    * g2/b2 the two LayerNorm scale/bias pairs; `wHead`/`bHead` the
    * pooled classifier. */
  final case class MiniEncoderWeights(
      seqLen: Int, dModel: Int, nHeads: Int, dFf: Int,
      wq: Array[Array[Array[Double]]], wk: Array[Array[Array[Double]]],
      wv: Array[Array[Array[Double]]],
      wo: Array[Array[Double]], bo: Array[Double],
      g1: Array[Double], b1: Array[Double],
      w1: Array[Array[Double]], bf1: Array[Double],
      w2: Array[Array[Double]], bf2: Array[Double],
      g2: Array[Double], b2: Array[Double],
      wHead: Array[Double], bHead: Double,
      attScale: Double, lnEps: Double)

  /** Export a REAL (toy-sized) transformer encoder as ONNX, opset 17:
    * Reshape [N, S·D] → [N, S, D]; per-head Q/K/V MatMuls, K transpose,
    * scaled QKᵀ, Softmax over keys, attention-weighted V; head Concat;
    * output projection + residual + LayerNormalization; Sigmoid FFN +
    * residual + LayerNormalization; mean-pool over positions; linear +
    * Sigmoid score. Every op here executes in [[OnnxSession]] — the
    * demonstration that the pure-JVM session runs ENCODER-shaped graphs
    * (3-D tensors, attention MatMuls, Softmax, LayerNorm), not just the
    * linear/MLP heads. Input column order is the flattened
    * `x_{s}_{d}` (position-major) feature list.
    */
  /** One encoder layer's weights for [[exportEncoderStack]] — same field
    * semantics as [[MiniEncoderWeights]] minus the stack-level head. */
  final case class EncoderLayer(
      wq: Array[Array[Array[Double]]], wk: Array[Array[Array[Double]]],
      wv: Array[Array[Array[Double]]],
      wo: Array[Array[Double]], bo: Array[Double],
      g1: Array[Double], b1: Array[Double],
      w1: Array[Array[Double]], bf1: Array[Double],
      w2: Array[Array[Double]], bf2: Array[Double],
      g2: Array[Double], b2: Array[Double])

  /** A DEEP encoder: `layers` stacked attention+FFN blocks (the
    * reference's BERT runs 12 of exactly this block,
    * `transformer_bert.py:88-224`) + the pooled head. */
  final case class EncoderStack(
      seqLen: Int, dModel: Int, nHeads: Int, dFf: Int,
      layers: Seq[EncoderLayer],
      wHead: Array[Double], bHead: Double,
      attScale: Double, lnEps: Double)

  /** @param withHead true → sigmoid classifier output `score [N,1]`
    *                  (Q7 pair scoring); false → the graph STOPS at the
    *                  mean-pooled encoder state `pooled [N,dModel]` — the
    *                  sentence/value EMBEDDING shape (Q6,
    *                  `embedding_search.py:25-42`), consumed through
    *                  [[Scorer.onnxEmbedderFactory]]. */
  def exportMiniEncoder(w: MiniEncoderWeights, path: String,
                        withHead: Boolean = true): Unit =
    exportEncoderStack(EncoderStack(w.seqLen, w.dModel, w.nHeads, w.dFf,
      Seq(EncoderLayer(w.wq, w.wk, w.wv, w.wo, w.bo, w.g1, w.b1,
        w.w1, w.bf1, w.w2, w.bf2, w.g2, w.b2)),
      w.wHead, w.bHead, w.attScale, w.lnEps), path, withHead)

  /** Export a REAL (toy-sized, arbitrarily DEEP) transformer encoder as
    * ONNX, opset 17: Reshape [N, S·D] → [N, S, D]; per layer — per-head
    * Q/K/V MatMuls, K transpose, scaled QKᵀ, Softmax over keys,
    * attention-weighted V, head Concat, output projection + residual +
    * LayerNormalization, Sigmoid FFN + residual + LayerNormalization —
    * then mean-pool over positions and (optionally) linear + Sigmoid
    * score. Every op executes in [[OnnxSession]]; node/initializer names
    * are layer-prefixed so the graph is plainly N stacked copies of the
    * reference block. */
  def exportEncoderStack(w: EncoderStack, path: String,
                         withHead: Boolean = true): Unit = {
    val (s, d, h, f) = (w.seqLen, w.dModel, w.nHeads, w.dFf)
    require(h > 0 && d % h == 0, s"dModel $d must divide into $h heads")
    require(w.layers.nonEmpty, "exportEncoderStack: at least one layer")
    val dh = d / h
    val features = for (i <- 0 until s; j <- 0 until d) yield s"x_${i}_$j"
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val inits = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    inits += tensorMsgI64("shape_sd", Seq(3L), Seq(-1L, s.toLong, d.toLong))
    inits += tensorMsg("att_scale", Seq(1L), Array(w.attScale))
    nodes += nodeMsg("Reshape", Seq("features", "shape_sd"), "x0")
    var cur = "x0"
    w.layers.zipWithIndex.foreach { case (lw, l) =>
      val P = s"L$l"
      val headOuts = (0 until h).map { hi =>
        inits += tensorMsg(s"${P}wq$hi", Seq(d.toLong, dh.toLong), lw.wq(hi).flatten)
        inits += tensorMsg(s"${P}wk$hi", Seq(d.toLong, dh.toLong), lw.wk(hi).flatten)
        inits += tensorMsg(s"${P}wv$hi", Seq(d.toLong, dh.toLong), lw.wv(hi).flatten)
        nodes += nodeMsg("MatMul", Seq(cur, s"${P}wq$hi"), s"${P}q$hi")
        nodes += nodeMsg("MatMul", Seq(cur, s"${P}wk$hi"), s"${P}k$hi")
        nodes += nodeMsg("MatMul", Seq(cur, s"${P}wv$hi"), s"${P}v$hi")
        nodes += nodeMsg("Transpose", Seq(s"${P}k$hi"), s"${P}kT$hi",
          Seq(attrInts("perm", Seq(0L, 2L, 1L))))
        nodes += nodeMsg("MatMul", Seq(s"${P}q$hi", s"${P}kT$hi"), s"${P}sc$hi")
        nodes += nodeMsg("Mul", Seq(s"${P}sc$hi", "att_scale"), s"${P}scl$hi")
        nodes += nodeMsg("Softmax", Seq(s"${P}scl$hi"), s"${P}at$hi",
          Seq(attrI("axis", -1L)))
        nodes += nodeMsg("MatMul", Seq(s"${P}at$hi", s"${P}v$hi"), s"${P}hd$hi")
        s"${P}hd$hi"
      }
      nodes += nodeMsg("Concat", headOuts, s"${P}ctx", Seq(attrI("axis", -1L)))
      inits += tensorMsg(s"${P}wo", Seq(d.toLong, d.toLong), lw.wo.flatten)
      inits += tensorMsg(s"${P}bo", Seq(d.toLong), lw.bo)
      nodes += nodeMsg("MatMul", Seq(s"${P}ctx", s"${P}wo"), s"${P}pj0")
      nodes += nodeMsg("Add", Seq(s"${P}pj0", s"${P}bo"), s"${P}pj")
      nodes += nodeMsg("Add", Seq(s"${P}pj", cur), s"${P}r1")
      inits += tensorMsg(s"${P}g1", Seq(d.toLong), lw.g1)
      inits += tensorMsg(s"${P}b1", Seq(d.toLong), lw.b1)
      nodes += nodeMsg("LayerNormalization",
        Seq(s"${P}r1", s"${P}g1", s"${P}b1"), s"${P}l1",
        Seq(attrI("axis", -1L), attrF("epsilon", w.lnEps.toFloat)))
      inits += tensorMsg(s"${P}w1", Seq(d.toLong, f.toLong), lw.w1.flatten)
      inits += tensorMsg(s"${P}bf1", Seq(f.toLong), lw.bf1)
      inits += tensorMsg(s"${P}w2", Seq(f.toLong, d.toLong), lw.w2.flatten)
      inits += tensorMsg(s"${P}bf2", Seq(d.toLong), lw.bf2)
      // Sigmoid FFN activation (not Tanh/Gelu): the DuckDB oracle has no
      // tanh/erf builtin, and sigmoid keeps BOTH engines on the literal
      // formula 1/(1+exp(−z)) — exp is then the only libm call in the
      // whole graph whose rounding differs across engines. Tanh/Erf
      // remain executable session ops (spec-pinned) for graphs needing
      // them.
      nodes += nodeMsg("MatMul", Seq(s"${P}l1", s"${P}w1"), s"${P}f0")
      nodes += nodeMsg("Add", Seq(s"${P}f0", s"${P}bf1"), s"${P}f1")
      nodes += nodeMsg("Sigmoid", Seq(s"${P}f1"), s"${P}f2")
      nodes += nodeMsg("MatMul", Seq(s"${P}f2", s"${P}w2"), s"${P}f3")
      nodes += nodeMsg("Add", Seq(s"${P}f3", s"${P}bf2"), s"${P}f4")
      nodes += nodeMsg("Add", Seq(s"${P}f4", s"${P}l1"), s"${P}r2")
      inits += tensorMsg(s"${P}g2", Seq(d.toLong), lw.g2)
      inits += tensorMsg(s"${P}b2", Seq(d.toLong), lw.b2)
      nodes += nodeMsg("LayerNormalization",
        Seq(s"${P}r2", s"${P}g2", s"${P}b2"), s"x${l + 1}",
        Seq(attrI("axis", -1L), attrF("epsilon", w.lnEps.toFloat)))
      cur = s"x${l + 1}"
    }
    nodes += nodeMsg("ReduceMean", Seq(cur), "pooled",
      Seq(attrInts("axes", Seq(1L)), attrI("keepdims", 0L)))
    if (withHead) {
      inits += tensorMsg("w_head", Seq(d.toLong, 1L), w.wHead)
      inits += tensorMsg("b_head", Seq(1L), Array(w.bHead))
      nodes += nodeMsg("MatMul", Seq("pooled", "w_head"), "z0")
      nodes += nodeMsg("Add", Seq("z0", "b_head"), "z1")
      nodes += nodeMsg("Sigmoid", Seq("z1"), "score")
    }
    val out = if (withHead) ("score", Seq(Left("N"): Either[String, Long], Right(1L)))
      else ("pooled", Seq(Left("N"): Either[String, Long], Right(d.toLong)))
    writeModel(path, "graft_mini_encoder", nodes.toSeq, inits.toSeq,
      input = ("features", Seq(Left("N"), Right((s * d).toLong))),
      output = out,
      features = features, opset = OpsetVersionLn)
  }
}

/** Minimal ONNX session: parses a `ModelProto` and executes its graph —
  * MatMul / Add (bias broadcast) / Sigmoid over 2-D DOUBLE tensors, the op
  * set linear scoring heads need. Node list, tensor names, dims, and
  * weights all come from the parsed file; nothing is hard-coded to the
  * exporter's layout beyond the public schema.
  */
final class OnnxSession(modelBytes: Array[Byte]) extends Serializable {
  import Proto._

  // EVERY nested parse goes through this wrapper, not just the top-level
  // ModelProto: malformed bytes can be length-consistent at the outer
  // framing while a nested graph/node/tensor message is garbage — those
  // must surface as not-a-ModelProto too, not as a raw bounds error.
  private def parsed(what: String, b: Array[Byte]): Message =
    try parse(b)
    catch { case e: RuntimeException =>
      throw new IllegalArgumentException(
        s"not a parseable ONNX ModelProto ($what, ${b.length} bytes): $e") }

  private val model = parsed("model", modelBytes)
  private val graph = parsed("graph", bytesAt(model, 7))
  require(graph.nonEmpty, "ONNX model has no graph (field 7 missing/empty)")

  /** metadata_props["features"] — the batch column order. */
  val features: Seq[String] = allBytes(model, 14).flatMap { kv =>
    val m = parsed("metadata_props", kv)
    if (stringAt(m, 1) == "features") stringAt(m, 2).split(',').toSeq else Nil
  }

  private case class Tensor(dims: Array[Int], data: Array[Double]) {
    def rank: Int = dims.length
  }

  private val initializers: Map[String, Tensor] = allBytes(graph, 5).map { t =>
    val m = parsed("initializer", t)
    val dims = packedVarintsAt(m, 1).map(_.toInt)
    val dt = varintAt(m, 2)
    val data = dt match {
      case OnnxExport.DataTypeDouble => packedDoublesAt(m, 10)
      // INT64 tensors (Reshape shapes, axis lists): small integers, held
      // losslessly in the double array — shape consumers read them back
      // with .toLong
      case OnnxExport.DataTypeInt64 => packedVarintsAt(m, 7).map(_.toDouble).toArray
      case other => throw new IllegalArgumentException(
        s"OnnxSession executes DOUBLE/INT64 tensors; got data_type $other")
    }
    stringAt(m, 8) -> Tensor(dims.toArray, data)
  }.toMap

  /** The attribute subset the executed op set uses: single int (axis,
    * keepdims), single float (epsilon), int list (perm, axes). */
  private case class Attr(i: Long, f: Float, ints: Seq[Long])
  private case class Node(op: String, ins: Seq[String], out: String,
                          attrs: Map[String, Attr])
  private val nodes: Seq[Node] = allBytes(graph, 1).map { n =>
    val m = parsed("node", n)
    val attrs = allBytes(m, 5).map { a =>
      val am = parsed("attribute", a)
      val fBits = am.getOrElse(2, Nil).collectFirst { case Fixed32V(v) => v }
      stringAt(am, 1) -> Attr(varintAt(am, 3),
        java.lang.Float.intBitsToFloat(fBits.getOrElse(0)),
        packedVarintsAt(am, 8))
    }.toMap
    Node(stringAt(m, 4), allBytes(m, 1).map(new String(_, "UTF-8")),
      stringAt(m, 2), attrs)
  }
  private val inputName: String = stringAt(parsed("input", bytesAt(graph, 11)), 1)
  private val outputName: String = stringAt(parsed("output", bytesAt(graph, 12)), 1)

  /** Forward one [n, d] batch → n scores (the [n, 1] output flattened;
    * use [[runMatrix]] for wider heads). */
  def run(batch: Array[Array[Double]]): Array[Double] = {
    val out = forward(batch)
    require(out.data.length == batch.length,
      s"expected ${batch.length} scores, got ${out.data.length} values — " +
        "wide output head? use runMatrix")
    out.data
  }

  /** Forward one [n, d] batch → [n, k] rows (embedding heads). */
  def runMatrix(batch: Array[Array[Double]]): Array[Array[Double]] = {
    val out = forward(batch)
    val n = batch.length
    if (n == 0) return Array.empty
    val k = out.data.length / n
    require(out.data.length == n * k, s"non-rectangular output ${out.data.length}")
    Array.tabulate(n)(i => java.util.Arrays.copyOfRange(out.data, i * k, (i + 1) * k))
  }

  // ---- rank-general op kernels -------------------------------------
  // Summation/iteration orders are FIXED (k ascending in MatMul, the
  // reduced axis ascending in ReduceMean/LayerNorm, lanes ascending in
  // Softmax) so an unrolled SQL replay of the same graph is
  // FP-bit-identical up to libm's exp/tanh (the q7 oracle discipline).

  /** [m,k]·[k,p] with k-ascending accumulation. */
  private def mm2(a: Array[Double], b: Array[Double],
                  m: Int, k: Int, p: Int, r: Array[Double], ro: Int,
                  ao: Int, bo: Int): Unit = {
    var i = 0
    while (i < m) {
      var j = 0
      while (j < p) {
        var s = 0.0; var t = 0
        while (t < k) { s += a(ao + i * k + t) * b(bo + t * p + j); t += 1 }
        r(ro + i * p + j) = s; j += 1
      }
      i += 1
    }
  }

  /** MatMul: 2-D×2-D, batched 3-D×2-D (shared weights), and 3-D×3-D
    * (attention QKᵀ / attn·V). */
  private def matmul(a: Tensor, b: Tensor): Tensor = (a.rank, b.rank) match {
    case (2, 2) =>
      require(a.dims(1) == b.dims(0), s"MatMul [${a.dims.mkString(",")}]x[${b.dims.mkString(",")}]")
      val r = new Array[Double](a.dims(0) * b.dims(1))
      mm2(a.data, b.data, a.dims(0), a.dims(1), b.dims(1), r, 0, 0, 0)
      Tensor(Array(a.dims(0), b.dims(1)), r)
    case (3, 2) =>
      require(a.dims(2) == b.dims(0), s"MatMul [${a.dims.mkString(",")}]x[${b.dims.mkString(",")}]")
      val (n, m, k, p) = (a.dims(0), a.dims(1), a.dims(2), b.dims(1))
      val r = new Array[Double](n * m * p)
      var bi = 0
      while (bi < n) {
        mm2(a.data, b.data, m, k, p, r, bi * m * p, bi * m * k, 0); bi += 1
      }
      Tensor(Array(n, m, p), r)
    case (3, 3) =>
      require(a.dims(0) == b.dims(0) && a.dims(2) == b.dims(1),
        s"MatMul [${a.dims.mkString(",")}]x[${b.dims.mkString(",")}]")
      val (n, m, k, p) = (a.dims(0), a.dims(1), a.dims(2), b.dims(2))
      val r = new Array[Double](n * m * p)
      var bi = 0
      while (bi < n) {
        mm2(a.data, b.data, m, k, p, r, bi * m * p, bi * m * k, bi * k * p)
        bi += 1
      }
      Tensor(Array(n, m, p), r)
    case (ra, rb) => throw new UnsupportedOperationException(
      s"MatMul ranks ${ra}x$rb")
  }

  private def strides(dims: Array[Int]): Array[Int] = {
    val s = new Array[Int](dims.length)
    var acc = 1
    var i = dims.length - 1
    while (i >= 0) { s(i) = acc; acc *= dims(i); i -= 1 }
    s
  }

  private def transpose(a: Tensor, perm: Array[Int]): Tensor = {
    require(perm.length == a.rank && perm.sorted.sameElements(0 until a.rank),
      s"Transpose perm ${perm.mkString(",")} for rank ${a.rank}")
    val od = perm.map(a.dims)
    val inS = strides(a.dims)
    val outS = strides(od)
    val r = new Array[Double](a.data.length)
    val idx = new Array[Int](a.rank)
    var flat = 0
    while (flat < a.data.length) {
      // decompose flat input index, scatter to permuted output position
      var rem = flat; var k = 0
      while (k < a.rank) { idx(k) = rem / inS(k); rem %= inS(k); k += 1 }
      var o = 0; k = 0
      while (k < a.rank) { o += idx(perm(k)) * outS(k); k += 1 }
      r(o) = a.data(flat)
      flat += 1
    }
    Tensor(od, r)
  }

  /** Numerically-stable Softmax over the LAST axis (the only axis the
    * encoder graphs use): exp(x − rowmax) / Σ, lanes ascending. */
  private def softmaxLast(a: Tensor): Tensor = {
    val lane = a.dims(a.rank - 1)
    val rows = a.data.length / lane
    val r = new Array[Double](a.data.length)
    var row = 0
    while (row < rows) {
      val off = row * lane
      var m = a.data(off)
      var i = 1
      while (i < lane) { if (a.data(off + i) > m) m = a.data(off + i); i += 1 }
      var s = 0.0
      i = 0
      while (i < lane) { r(off + i) = math.exp(a.data(off + i) - m); s += r(off + i); i += 1 }
      i = 0
      while (i < lane) { r(off + i) /= s; i += 1 }
      row += 1
    }
    Tensor(a.dims, r)
  }

  /** Concat over the LAST axis. */
  private def concatLast(ts: Seq[Tensor]): Tensor = {
    val lead = ts.head.dims.dropRight(1)
    require(ts.forall(_.dims.dropRight(1).sameElements(lead)),
      "Concat: leading dims differ")
    val lanes = ts.map(_.dims.last)
    val outLane = lanes.sum
    val rows = ts.head.data.length / ts.head.dims.last
    val r = new Array[Double](rows * outLane)
    var row = 0
    while (row < rows) {
      var o = row * outLane
      var ti = 0
      while (ti < ts.length) {
        val t = ts(ti); val l = lanes(ti)
        System.arraycopy(t.data, row * l, r, o, l)
        o += l; ti += 1
      }
      row += 1
    }
    Tensor((lead :+ outLane).toArray, r)
  }

  /** LayerNormalization over the last axis: for each lane vector x,
    * out = ((x − mean) / sqrt(var + eps)) · scale + bias, with mean and
    * population variance accumulated lanes-ascending. */
  private def layerNorm(x: Tensor, scale: Tensor, bias: Tensor,
                        eps: Double): Tensor = {
    val lane = x.dims(x.rank - 1)
    require(scale.data.length == lane && bias.data.length == lane,
      s"LayerNormalization lane $lane vs scale ${scale.data.length}")
    val rows = x.data.length / lane
    val r = new Array[Double](x.data.length)
    var row = 0
    while (row < rows) {
      val off = row * lane
      var s = 0.0; var i = 0
      while (i < lane) { s += x.data(off + i); i += 1 }
      val mean = s / lane
      var v = 0.0; i = 0
      while (i < lane) {
        val d = x.data(off + i) - mean; v += d * d; i += 1
      }
      val varp = v / lane
      val inv = math.sqrt(varp + eps)
      i = 0
      while (i < lane) {
        r(off + i) = ((x.data(off + i) - mean) / inv) * scale.data(i) + bias.data(i)
        i += 1
      }
      row += 1
    }
    Tensor(x.dims, r)
  }

  /** ReduceMean over ONE axis, keepdims=0, axis ascending accumulation. */
  private def reduceMean(a: Tensor, axis: Int): Tensor = {
    val ax = if (axis < 0) a.rank + axis else axis
    val n = a.dims(ax)
    val outer = a.dims.take(ax).product
    val inner = a.dims.drop(ax + 1).product
    val r = new Array[Double](outer * inner)
    var o = 0
    while (o < outer) {
      var in = 0
      while (in < inner) {
        var s = 0.0; var k = 0
        while (k < n) { s += a.data((o * n + k) * inner + in); k += 1 }
        r(o * inner + in) = s / n
        in += 1
      }
      o += 1
    }
    Tensor((a.dims.take(ax) ++ a.dims.drop(ax + 1)), r)
  }

  /** erf(x), Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7) — the Gelu
    * building block; precision documented, spec-tested against known
    * values (not used by the oracle-verified encoder, which runs Sigmoid).
    */
  private def erf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) *
      t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  private def forward(batch: Array[Array[Double]]): Tensor = {
    val n = batch.length
    if (n == 0) return Tensor(Array(0, 0), Array.empty)
    val d = batch(0).length
    var values = Map[String, Tensor](
      inputName -> Tensor(Array(n, d), batch.flatten))
    def get(name: String): Tensor =
      values.getOrElse(name, initializers.getOrElse(name,
        throw new IllegalStateException(s"unbound tensor '$name'")))
    nodes.foreach { node =>
      def attr(name: String): Attr = node.attrs.getOrElse(name,
        throw new IllegalArgumentException(s"${node.op}: missing attr '$name'"))
      val out = node.op match {
        case "MatMul" => matmul(get(node.ins(0)), get(node.ins(1)))
        case "Gemm" => // alpha·op(A)·op(B) + beta·C — the linear-layer op
          // torch-exported checkpoints emit (MatMul+Add is our writers')
          val trA = node.attrs.get("transA").exists(_.i == 1L)
          val trB = node.attrs.get("transB").exists(_.i == 1L)
          val a = { val t = get(node.ins(0)); if (trA) transpose(t, Array(1, 0)) else t }
          val b = { val t = get(node.ins(1)); if (trB) transpose(t, Array(1, 0)) else t }
          require(a.rank == 2 && b.rank == 2, "Gemm: rank-2 inputs only")
          val alpha = node.attrs.get("alpha").map(_.f.toDouble).getOrElse(1.0)
          val beta = node.attrs.get("beta").map(_.f.toDouble).getOrElse(1.0)
          val mm = matmul(a, b)
          if (node.ins.length > 2 && node.ins(2).nonEmpty) {
            val c = get(node.ins(2))
            Tensor(mm.dims, mm.data.zipWithIndex.map { case (v, i) =>
              alpha * v + beta * c.data(i % c.data.length) })
          } else if (alpha == 1.0) mm
          else Tensor(mm.dims, mm.data.map(alpha * _))
        case "Add" => // right side trailing-broadcast (bias) or same-shape
          val (a, b) = (get(node.ins(0)), get(node.ins(1)))
          Tensor(a.dims, a.data.zipWithIndex.map { case (v, i) =>
            v + b.data(i % b.data.length) })
        case "Mul" => // same-shape or trailing/scalar broadcast
          val (a, b) = (get(node.ins(0)), get(node.ins(1)))
          Tensor(a.dims, a.data.zipWithIndex.map { case (v, i) =>
            v * b.data(i % b.data.length) })
        case "Reshape" =>
          val a = get(node.ins(0))
          val spec = get(node.ins(1)).data.map(_.toLong)
          val fixed = spec.filter(_ > 0).product
          val dims = spec.map { s =>
            if (s > 0) s.toInt
            else (a.data.length / math.max(fixed, 1L)).toInt // the one -1
          }
          require(dims.product == a.data.length,
            s"Reshape ${spec.mkString(",")} on ${a.data.length} values")
          Tensor(dims, a.data)
        case "Transpose" =>
          transpose(get(node.ins(0)), attr("perm").ints.map(_.toInt).toArray)
        case "Softmax" =>
          val a = get(node.ins(0))
          val ax = node.attrs.get("axis").map(_.i).getOrElse(-1L)
          require(ax == -1L || ax == a.rank - 1,
            s"Softmax: only the last axis is supported, got $ax")
          softmaxLast(a)
        case "Concat" =>
          val ts = node.ins.map(get)
          val ax = attr("axis").i
          require(ax == -1L || ax == ts.head.rank - 1,
            s"Concat: only the last axis is supported, got $ax")
          concatLast(ts)
        case "LayerNormalization" =>
          val ax = node.attrs.get("axis").map(_.i).getOrElse(-1L)
          val x = get(node.ins(0))
          require(ax == -1L || ax == x.rank - 1,
            s"LayerNormalization: only the last axis is supported, got $ax")
          val eps = node.attrs.get("epsilon").map(_.f.toDouble).getOrElse(1e-5)
          layerNorm(x, get(node.ins(1)), get(node.ins(2)), eps)
        case "ReduceMean" =>
          require(node.attrs.get("keepdims").forall(_.i == 0L),
            "ReduceMean: only keepdims=0 is supported")
          val axes = attr("axes").ints
          require(axes.length == 1, "ReduceMean: exactly one axis")
          reduceMean(get(node.ins(0)), axes.head.toInt)
        case "Sigmoid" =>
          val a = get(node.ins(0))
          Tensor(a.dims, a.data.map(z => 1.0 / (1.0 + math.exp(-z))))
        case "Relu" =>
          val a = get(node.ins(0))
          Tensor(a.dims, a.data.map(z => if (z > 0) z else 0.0))
        case "Tanh" =>
          val a = get(node.ins(0))
          Tensor(a.dims, a.data.map(math.tanh))
        case "Erf" =>
          val a = get(node.ins(0))
          Tensor(a.dims, a.data.map(erf))
        case op => throw new UnsupportedOperationException(s"op '$op'")
      }
      values += node.out -> out
    }
    values(outputName)
  }
}

object OnnxSession {
  def load(path: String): OnnxSession =
    new OnnxSession(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}

/** Protobuf wire-format helpers (the subset onnx.proto needs): varint,
  * length-delimited, packed scalar fields. Writer emits proto3-canonical
  * packed repeated scalars; reader accepts packed and unpacked.
  */
private[ml] object Proto {

  // ---- writing ----
  def varint(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += (x & 0x7f).toByte
    out.toArray
  }
  private def tag(field: Int, wire: Int) = varint((field.toLong << 3) | wire)
  def varintField(field: Int, v: Long): Array[Byte] = tag(field, 0) ++ varint(v)
  def fixed32Field(field: Int, bits: Int): Array[Byte] =
    tag(field, 5) ++ Array[Byte](bits.toByte, (bits >> 8).toByte,
      (bits >> 16).toByte, (bits >> 24).toByte)
  def lenDelim(field: Int, bytes: Array[Byte]): Array[Byte] =
    tag(field, 2) ++ varint(bytes.length.toLong) ++ bytes
  def stringField(field: Int, s: String): Array[Byte] = lenDelim(field, s.getBytes("UTF-8"))
  def packedVarints(vs: Seq[Long]): Array[Byte] = vs.toArray.flatMap(varint)
  def packedDoubles(vs: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble); bb.array()
  }
  def concat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  // ---- reading ----
  sealed trait Value
  final case class VarintV(v: Long) extends Value
  final case class BytesV(b: Array[Byte]) extends Value
  final case class Fixed64V(v: Long) extends Value
  final case class Fixed32V(v: Int) extends Value
  type Message = Map[Int, Seq[Value]]

  def parse(bytes: Array[Byte]): Message = {
    val out = scala.collection.mutable.Map.empty[Int, Vector[Value]]
    var i = 0
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        // explicit bound: a varint running off the buffer end must surface
        // as not-a-ModelProto, not an ArrayIndexOutOfBoundsException —
        // malformed bytes can be length-consistent at the OUTER framing
        // while a nested message ends mid-varint
        if (i >= bytes.length)
          throw new IllegalArgumentException(s"truncated varint at offset $i")
        if (shift > 63)
          throw new IllegalArgumentException(s"varint overflow at offset $i")
        val b = bytes(i); i += 1; v |= (b & 0x7fL) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    while (i < bytes.length) {
      val key = readVarint()
      val (field, wire) = ((key >>> 3).toInt, (key & 7).toInt)
      val value: Value = wire match {
        case 0 => VarintV(readVarint())
        case 1 =>
          if (i + 8 > bytes.length)
            throw new IllegalArgumentException(s"truncated fixed64 at offset $i")
          val v = java.nio.ByteBuffer.wrap(bytes, i, 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          i += 8; Fixed64V(v)
        case 2 =>
          val len = readVarint().toInt
          // copyOfRange would silently zero-PAD past the end — a truncated
          // model must fail at load, not score every row as sigmoid(0)
          if (len < 0 || i + len > bytes.length)
            throw new IllegalArgumentException(
              s"truncated length-delimited field: $len bytes at offset $i of ${bytes.length}")
          val b = java.util.Arrays.copyOfRange(bytes, i, i + len)
          i += len; BytesV(b)
        case 5 =>
          if (i + 4 > bytes.length)
            throw new IllegalArgumentException(s"truncated fixed32 at offset $i")
          val v = java.nio.ByteBuffer.wrap(bytes, i, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          i += 4; Fixed32V(v)
        case w => throw new IllegalArgumentException(s"wire type $w")
      }
      out(field) = out.getOrElse(field, Vector.empty) :+ value
    }
    out.toMap
  }

  def allBytes(m: Message, field: Int): Seq[Array[Byte]] =
    m.getOrElse(field, Nil).collect { case BytesV(b) => b }
  def bytesAt(m: Message, field: Int): Array[Byte] =
    allBytes(m, field).headOption.getOrElse(Array.empty)
  def stringAt(m: Message, field: Int): String =
    new String(bytesAt(m, field), "UTF-8")
  def varintAt(m: Message, field: Int): Long =
    m.getOrElse(field, Nil).collectFirst { case VarintV(v) => v }.getOrElse(0L)
  /** Packed or unpacked repeated varints. */
  def packedVarintsAt(m: Message, field: Int): Seq[Long] =
    m.getOrElse(field, Nil).flatMap {
      case VarintV(v) => Seq(v)
      case BytesV(b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        var i = 0
        while (i < b.length) {
          var shift = 0; var v = 0L
          var more = true
          while (more) {
            if (i >= b.length) throw new IllegalArgumentException(
              "truncated packed varint")
            if (shift > 63) throw new IllegalArgumentException(
              "packed varint overflow") // same guard as readVarint: a
            // shift ≥ 64 wraps mod 64 and folds high bytes into low bits
            val x = b(i); i += 1; v |= (x & 0x7fL) << shift; shift += 7
            more = (x & 0x80) != 0
          }
          out += v
        }
        out.toSeq
      case _ => Nil
    }
  /** Packed repeated doubles (or unpacked fixed64s). */
  def packedDoublesAt(m: Message, field: Int): Array[Double] =
    m.getOrElse(field, Nil).flatMap {
      case BytesV(b) =>
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Array.fill(b.length / 8)(bb.getDouble).toSeq
      case Fixed64V(v) => Seq(java.lang.Double.longBitsToDouble(v))
      case _ => Nil
    }.toArray
}
