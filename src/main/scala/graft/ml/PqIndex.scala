package graft.ml

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VecMath

/** Product-quantization (PQ) ANN: each vector is split into M
  * subvectors; each subvector is replaced by the id of its nearest
  * entry in a per-subspace codebook (ksub entries, trained k-means).
  * A vector becomes M small codes — at D=64, M=16, ksub=16 that is
  * 16 4-bit codes = 8 logical bytes against 256 bytes of float32, a
  * 32× compression (the frame stores them as ints; parquet's
  * dictionary/bit-packing gets them to ~4 bits at rest) — and a
  * query scores a candidate WITHOUT touching the original vector:
  * score ≈ Σ_m LUT[m][code_m], where LUT is the query's M×ksub table
  * of subvector dot products (asymmetric distance computation, ADC).
  *
  * Defaults follow the measured recall ladder on the isotropic
  * sf0.001 fixture (recall@3 vs brute-force x05, shortlist 32/64/128):
  * m=8,ksub=16 → 0.40/0.67/0.87; m=8,ksub=64 → 0.80/0.93/1.00;
  * m=16,ksub=16 → 0.87/1.00/1.00; m=16,ksub=64 → 1.00/—/—. At equal
  * logical size (8 B/vec), MORE subspaces with SMALLER codebooks wins
  * on isotropic data (quantization error scales with subspace
  * dimensionality), so the default is m=16, ksub=16, shortlist=64 —
  * measured 1.00, spec floor 0.9.
  *
  * This is the memory leg of the similarity-search story, complementing
  * [[IvfIndex]]'s partition-pruning leg: IVF decides WHICH lists to
  * scan, PQ makes each scanned row 32× smaller. At 100 TB of raw
  * vectors the code table is ~3 TB — a scannable working set — and the
  * classic composition (IVF lists holding PQ codes) follows from these
  * two pieces unchanged. Ranking is by approximate COSINE: the code row
  * carries the stored vector's true norm (8 more bytes), so
  * approx_cos = ADC_ip / (|q|·|v|) ranks on the same scale x05 uses,
  * and the final exact re-rank joins the top-S shortlist — and ONLY
  * the shortlist — back to the full vectors by id (the narrow late
  * materialization a 100 TB deployment does against the vector store).
  *
  * Training mirrors the IVF quantizer: bounded deterministic sample
  * (xxhash64 order), local per-subspace Lloyd's, fixed iterations —
  * deterministic but not SQL-expressible, so the query entry (x75) is
  * rows-only; the accuracy contract is PqRecallSpec (the ADC identity
  * on zero-error reconstructions + a pinned recall floor vs exact
  * x05). Encoding and scoring are pure codegen HOF expressions: the
  * per-m score matrix is projected to an attribute BEFORE the argmax
  * so the ksub dot products evaluate once (HOF args re-evaluate per
  * call — same pitfall IvfIndex documents).
  */
object PqIndex {

  /** The built index: (vec_id, codes array<int>, vnorm) — the
    * compressed frame a deployment keeps hot — plus the driver-held
    * codebooks (M × ksub × dsub, kilobytes) that broadcast as plan
    * literals.
    */
  final case class Index(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
      m: Int, dsub: Int)

  private val cache = new ConcurrentHashMap[(Int, String, Int, Int), Index]()

  def build(spark: SparkSession, sfDir: String, m: Int = 16, ksub: Int = 16): Index = {
    val key = (System.identityHashCode(spark), sfDir, m, ksub)
    cache.computeIfAbsent(key, _ => {
      val emb = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))

      // --- train: ONE bounded deterministic sample, M local Lloyd's ---
      val maxTrain = ksub * 256
      val sample = emb
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(maxTrain)
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      val dim = sample.head.length
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val dsub = dim / m
      val codebooks = Array.tabulate(m) { mi =>
        IvfIndex.lloyds(sample.map(_.slice(mi * dsub, (mi + 1) * dsub)), ksub, iters = 20)
      }

      // --- encode: distributed, codebooks as broadcast literals ---
      // per subspace: argmax of (v_m·c − |c|²/2) ≡ Euclidean argmin
      val scores = transform(sequence(lit(0), lit(m - 1)), mi => {
        val sub = slice(col("v"), mi * dsub + 1, lit(dsub))
        zip_with(element_at(codebookLit(codebooks), mi + 1),
          element_at(offsetLit(codebooks), mi + 1),
          (c, o) => VecMath.dot(sub, c) - o)
      })
      val codes = emb
        .withColumn("sc", scores) // attribute: the M×ksub dots evaluate once
        .select(col("vec_id"),
          transform(col("sc"), s =>
            (array_position(s, array_max(s)) - 1).cast("int")).as("codes"),
          VecMath.l2norm(col("v")).as("vnorm"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      Index(codes, codebooks, m, dsub)
    })
  }

  private[graft] def codebookLit(cb: Array[Array[Array[Double]]]): Column =
    array(cb.toIndexedSeq.map(b =>
      array(b.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit(_)): _*)): _*)): _*)

  private def offsetLit(cb: Array[Array[Array[Double]]]): Column =
    array(cb.toIndexedSeq.map(b =>
      array(b.toIndexedSeq.map(c => lit(0.5 * c.map(x => x * x).sum)): _*)): _*)

  /** The query's ADC lookup table: M×ksub subvector dot products,
    * evaluated once as an attribute of the (small, broadcast) query
    * frame — scoring a candidate is then M array lookups + adds.
    */
  private[graft] def lutFor(index: Index, qv: Column): Column =
    transform(sequence(lit(0), lit(index.m - 1)), mi =>
      transform(element_at(codebookLit(index.codebooks), mi + 1), c =>
        VecMath.dot(slice(qv, mi * index.dsub + 1, lit(index.dsub)), c)))

  /** The ADC inner product of one code row against a query's LUT. */
  private[graft] def adcIp(lut: Column, codes: Column): Column =
    aggregate(zip_with(lut, codes, (t, c) => element_at(t, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** ADC shortlist (top `shortlist` by approximate cosine, scanning
    * only the compressed code frame) → exact re-rank of the shortlist
    * against the full vectors → top-k.
    */
  def search(spark: SparkSession, sfDir: String, index: Index, queries: DataFrame,
      shortlist: Int = 64, topK: Int = 3): DataFrame = {
    val q = queries
      .withColumn("lut", lutFor(index, col("qv")))
      .withColumn("qnorm", VecMath.l2norm(col("qv")))
    val approx = index.codes.join(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx_cos",
        adcIp(col("lut"), col("codes")) / (col("qnorm") * col("vnorm")))
    val sw = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val short = approx.withColumn("sr", row_number().over(sw))
      .filter(col("sr") <= shortlist)
      .select("query_id", "qv", "vec_id")

    // late materialization: ONLY the shortlist ids touch full vectors
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))
    val exact = short.join(emb, Seq("vec_id"))
      .withColumn("cos", VecMath.cosine(col("qv"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    exact.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .select(col("query_id"), col("rn"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rn")
  }

  def searchTopK(spark: SparkSession, sfDir: String, m: Int = 16, ksub: Int = 16,
      shortlist: Int = 64, topK: Int = 3): DataFrame = {
    val index = build(spark, sfDir, m, ksub)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VecMath.asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    search(spark, sfDir, index, queries, shortlist, topK)
  }

  /** Drop all built indexes (frees the persisted code frames). */
  def clear(): Unit = {
    cache.values().forEach(ix => { ix.codes.unpersist(); () })
    cache.clear()
  }
}
