package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Model-in-the-loop scoring seam (Q1/Q7) — the pluggable interface the
  * reference fills with a torch checkpoint (`/root/reference/tabsketchfm/
  * extract_embeddings.py:16-117`: load model, batch rows, forward pass,
  * collect vectors).
  *
  * Spark-side contract: scoring is a whole-DataFrame transform so the
  * engine can keep it distributed; the external-model implementations run
  * `mapPartitions` with ONE model handle per partition and fixed-size
  * batches — exactly the shape an ONNX Runtime / JNI session needs. The
  * container ships no inference runtime, so tests plug deterministic fakes
  * into the same seam; swapping in a real session changes only the
  * factory closure, none of the plumbing.
  */
trait TableScorer extends Serializable {
  /** Append a score/embedding column to `features`. Must not reorder or
    * drop input columns — downstream pair joins rely on passthrough. */
  def score(features: DataFrame): DataFrame
}

object Scorer {

  /** MLlib-native implementation: the trained pipeline from
    * [[PairScoring.trainScorer]] IS the model; `transform` keeps the whole
    * plan in Catalyst (no partition barrier, codegen where MLlib allows).
    */
  final class PipelineScorer(model: org.apache.spark.ml.PipelineModel)
      extends TableScorer {
    def score(features: DataFrame): DataFrame = model.transform(features)
  }

  /** External-model scorer: one `Double` per row from a batched forward
    * pass. `modelFactory` runs once per partition — that is where a real
    * integration opens its ONNX session / JNI handle — and receives
    * `batchSize`-row matrices (the batch shape inference runtimes want).
    */
  final class ExternalModelScorer(
      modelFactory: () => Array[Array[Double]] => Array[Double],
      featureCols: Seq[String],
      batchSize: Int = 256,
      outputCol: String = "score") extends TableScorer {

    def score(features: DataFrame): DataFrame = {
      val schema = features.schema
      val outSchema = schema.add(outputCol, DoubleType, nullable = false)
      val idxs = featureCols.map(schema.fieldIndex).toArray
      val bs = batchSize
      implicit val enc = RowEncoder.encoderFor(outSchema)
      features.mapPartitions { it =>
        val model = modelFactory() // per-partition init (session/handle)
        it.grouped(bs).flatMap { rows =>
          val m = rows.map(r => idxs.map(i => r.getAs[Number](i).doubleValue())).toArray
          val scores = model(m)
          require(scores.length == rows.length,
            s"scorer returned ${scores.length} scores for ${rows.length} rows")
          rows.lazyZip(scores).map { (r, s) => Row.fromSeq(r.toSeq :+ s) }
        }
      }
    }
  }

  /** External embedder (Q1): one `Array[Float]` per row — the
    * `extract_embeddings` shape. Same per-partition/batched contract as
    * [[ExternalModelScorer]]; input is the row's feature columns, output a
    * fixed-`dim` vector column.
    */
  final class ExternalEmbedder(
      modelFactory: () => Array[Array[Double]] => Array[Array[Float]],
      featureCols: Seq[String],
      dim: Int,
      batchSize: Int = 256,
      outputCol: String = "embedding") extends TableScorer {

    def score(features: DataFrame): DataFrame = {
      val schema = features.schema
      val outSchema = schema.add(outputCol, ArrayType(FloatType, containsNull = false))
      val idxs = featureCols.map(schema.fieldIndex).toArray
      val (bs, d) = (batchSize, dim)
      implicit val enc = RowEncoder.encoderFor(outSchema)
      features.mapPartitions { it =>
        val model = modelFactory()
        it.grouped(bs).flatMap { rows =>
          val m = rows.map(r => idxs.map(i => r.getAs[Number](i).doubleValue())).toArray
          val vecs = model(m)
          require(vecs.length == rows.length && vecs.forall(_.length == d),
            s"embedder must return one $d-dim vector per row")
          rows.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
        }
      }
    }
  }
}
