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
  val DataTypeDouble = 11 // TensorProto.DataType.DOUBLE

  // ---- shared protobuf constructors (one definition for all exporters) ----
  private def tensorMsg(name: String, dims: Seq[Long], data: Array[Double]): Array[Byte] = {
    concat(lenDelim(1, packedVarints(dims)), varintField(2, DataTypeDouble),
      lenDelim(10, packedDoubles(data)), stringField(8, name))
  }
  private def nodeMsg(op: String, ins: Seq[String], out: String): Array[Byte] = {
    concat(ins.map(stringField(1, _)) :+ stringField(2, out) :+ stringField(4, op): _*)
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
                         features: Seq[String]): Unit = {
    val graph = concat(
      (nodes.map(lenDelim(1, _)) ++ Seq(stringField(2, graphName)) ++
        inits.map(lenDelim(5, _)) ++ Seq(
        lenDelim(11, valueInfoMsg(input._1, input._2)),
        lenDelim(12, valueInfoMsg(output._1, output._2)))): _*)
    val modelBytes = concat(
      varintField(1, 8L), stringField(2, "graft"), lenDelim(7, graph),
      lenDelim(8, varintField(2, OpsetVersion)),
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

  private case class Tensor(dims: Array[Int], data: Array[Double])

  private val initializers: Map[String, Tensor] = allBytes(graph, 5).map { t =>
    val m = parsed("initializer", t)
    val dims = packedVarintsAt(m, 1).map(_.toInt)
    require(varintAt(m, 2) == OnnxExport.DataTypeDouble,
      s"OnnxSession executes DOUBLE tensors; got data_type ${varintAt(m, 2)}")
    stringAt(m, 8) -> Tensor(dims.toArray, packedDoublesAt(m, 10))
  }.toMap

  private case class Node(op: String, ins: Seq[String], out: String)
  private val nodes: Seq[Node] = allBytes(graph, 1).map { n =>
    val m = parsed("node", n)
    Node(stringAt(m, 4), allBytes(m, 1).map(new String(_, "UTF-8")), stringAt(m, 2))
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
      val out = node.op match {
        case "MatMul" =>
          val (a, b) = (get(node.ins(0)), get(node.ins(1)))
          val (m, k, p) = (a.dims(0), a.dims(1), b.dims(1))
          require(b.dims(0) == k, s"MatMul shape [$m,$k]x[${b.dims(0)},$p]")
          val r = new Array[Double](m * p)
          var i = 0
          while (i < m) {
            var j = 0
            while (j < p) {
              var s = 0.0; var t = 0
              while (t < k) { s += a.data(i * k + t) * b.data(t * p + j); t += 1 }
              r(i * p + j) = s; j += 1
            }
            i += 1
          }
          Tensor(Array(m, p), r)
        case "Add" => // right side broadcast (bias)
          val (a, b) = (get(node.ins(0)), get(node.ins(1)))
          Tensor(a.dims, a.data.zipWithIndex.map { case (v, i) =>
            v + b.data(i % b.data.length) })
        case "Sigmoid" =>
          val a = get(node.ins(0))
          Tensor(a.dims, a.data.map(z => 1.0 / (1.0 + math.exp(-z))))
        case "Relu" =>
          val a = get(node.ins(0))
          Tensor(a.dims, a.data.map(z => if (z > 0) z else 0.0))
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
