package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable store for TRAINED ARTIFACTS — classifier weights, LM count
  * tables, BPE merge lists, IVF centroids, threshold/boundary scalars:
  * everything a serving pipeline needs so an ingest deployment can LOAD
  * last night's model instead of retraining inline (the production gap
  * the serving twins had: every one derived its offline half in-plan).
  *
  * Layout — one GENERATION per save, never overwritten in place:
  * {{{
  *   <root>/gen=<k>/<name>/part-*.parquet   one parquet dir per relation
  *   <root>/gen=<k>/meta_params/            (k, v) string params relation
  *   <root>/LATEST                          the committed generation id
  *   <root>/_staging-<uuid>/                per-save scratch
  * }}}
  * Params ride as a tiny parquet relation rather than a JSON file: no
  * hand-rolled parsing, and doubles/longs round-trip exactly through the
  * same codec as every other relation (a double is stored via
  * `java.lang.Double.toString`, whose parse round-trip is exact by spec).
  *
  * Commit protocol — the Export/DriverFold doctrine applied to models:
  *  1. everything (relations + params) writes under a PER-SAVE staging
  *     directory (`_staging-<uuid>` — two concurrent saves can never
  *     touch each other's scratch);
  *  2. the generation id is CLAIMED by atomically creating
  *     `.gen-<k>.claim` with overwrite=false (create-fails-if-exists is
  *     atomic on HDFS-semantics filesystems — `rename` is NOT a usable
  *     CAS here: renaming onto an existing directory moves the source
  *     INSIDE it on both HDFS and local fs); a saver that loses the
  *     claim re-scans, bumps k and retries, so concurrent savers
  *     serialize into distinct generations (r12 advice). Claims persist
  *     until their generation prunes — deleting one early would let a
  *     racer with a stale scan re-claim a committed id. Then ONE atomic
  *     rename promotes staging to `gen=<k>` (a generation directory
  *     that exists is complete by construction);
  *  3. the LATEST pointer updates by tmp-write → delete → rename —
  *     single-file renames are atomic on HDFS-semantics filesystems.
  *     (Two savers flipping the pointer concurrently settle on whichever
  *     rename lands last — both targets are complete generations.)
  * Crash windows: during staging → LATEST untouched, readers serve the
  * previous generation, the orphan scrubs once idle past
  * [[StagingTtlMs]] (age-gated so an ACTIVE concurrent save's staging
  * survives); between gen rename and pointer → same (the
  * complete-but-unpointed generation is simply superseded); between
  * pointer delete and rename → the tmp pointer is complete (it is
  * written BEFORE the delete), so [[latestGen]] rolls forward by reading
  * it. Every window lands on a loadable store (spec-driven in
  * ModelStoreSpec).
  *
  * Readers pin a generation: [[latestGen]] once, then load every
  * relation from that generation — a concurrent save can commit a new
  * generation mid-read without tearing the reader (generations are
  * immutable; pruning retains `keep` generations so a reader holding the
  * previous pointer survives one full save cycle).
  *
  * Scale: relations are parquet — a 10⁹-row LM table loads as an
  * ordinary distributed scan (and broadcast-guards downstream exactly
  * like a freshly trained one); only the pointer and params are
  * driver-sized.
  */
object ModelStore {

  val LatestFile = "LATEST"
  val StagingPrefix = "_staging"

  /** Orphaned-staging scrub age: a `_staging-<uuid>` tree idle this long
    * is a crashed save's leftover and is deleted by the next save. The
    * gate is the staging directory's own modification time (bumped by
    * every direct-child relation write), so a save actively writing
    * relations keeps its staging alive. */
  val StagingTtlMs: Long = 60L * 60L * 1000L
  // no leading underscore: Spark's file listing treats `_`-prefixed
  // paths as hidden, which makes an underscore-named leaf readable only
  // through a fallback path (and WARN-noisy)
  val ParamsRel = "meta_params"

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** The generation-id claim marker — see the commit protocol above. */
  private def claimPath(root: Path, gen: Long): Path =
    new Path(root, s".gen-$gen.claim")

  /** Committed generation ids under `root`, newest first (directory
    * scan — includes committed-but-unpointed generations, which is what
    * the next-gen allocator needs; readers use [[latestGen]]). */
  private def genDirs(fs: FileSystem, root: Path): Seq[Long] = {
    val st = fs.globStatus(new Path(root, "gen=*"))
    if (st == null) Seq.empty
    else st.toSeq.flatMap { s =>
      val n = s.getPath.getName
      scala.util.Try(n.stripPrefix("gen=").toLong).toOption
    }.sorted.reverse
  }

  /** The generation the LATEST pointer commits — rolling forward from
    * the pointer's own crash window (a complete tmp pointer with the
    * target missing means the delete happened but not the rename). */
  def latestGen(spark: SparkSession, root: String): Option[Long] = {
    val rootP = new Path(root)
    val fs = fsFor(spark, rootP)
    val latest = new Path(rootP, LatestFile)
    val tmp = new Path(rootP, s".$LatestFile.tmp")
    def readLong(p: Path): Option[Long] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](256)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          val s = new String(buf.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8).trim
          scala.util.Try(s.toLong).toOption
        } finally in.close()
      }
    readLong(latest).orElse(readLong(tmp))
  }

  /** Save one model version: all relations + params commit as one new
    * generation, the pointer flips atomically, generations beyond `keep`
    * prune. Returns the committed generation id. `beforeCommit` runs
    * after staging is fully written, before the generation rename;
    * `beforePointer` between the rename and the pointer flip — the crash
    * windows specs inject into.
    */
  /** [[save]] only if `root` has NO committed generation yet; otherwise
    * return the existing one untouched. This is the serve-path memo for
    * rows whose store content is a pure function of the root's identity
    * (the caller keys `root` by corpus + process — see the registries'
    * serveRoot): the first touch builds and commits, every later touch
    * — a bench re-measure, a second query sharing the index — is load
    * + probe only. `relations`/`params` are by-name so a hit never even
    * constructs the build plan. NOT for append/refresh flows, which
    * need explicit generation control.
    */
  def ensure(spark: SparkSession, root: String,
      relations: => Seq[(String, DataFrame)],
      params: => Map[String, String] = Map.empty): Long =
    latestGen(spark, root).getOrElse(save(spark, root, relations, params))

  def save(spark: SparkSession, root: String,
      relations: Seq[(String, DataFrame)],
      params: Map[String, String] = Map.empty,
      keep: Int = 2,
      beforeCommit: Long => Unit = _ => (),
      beforePointer: Long => Unit = _ => (),
      stagingTtlMs: Long = StagingTtlMs): Long = {
    require(keep >= 1, s"must retain at least one generation: $keep")
    require(!relations.exists(_._1 == ParamsRel),
      s"$ParamsRel is the reserved params relation name")
    val rootP = new Path(root)
    val fs = fsFor(spark, rootP)
    fs.mkdirs(rootP)
    // scrub ORPHANED staging trees (crashed saves) — age-gated, so a
    // concurrent save's live staging is never touched
    val stale = fs.globStatus(new Path(rootP, s"$StagingPrefix-*"))
    if (stale != null) {
      val now = System.currentTimeMillis()
      stale.foreach { s =>
        if (now - s.getModificationTime > stagingTtlMs) fs.delete(s.getPath, true)
      }
    }
    val staging = new Path(rootP,
      s"$StagingPrefix-${java.util.UUID.randomUUID().toString}")
    relations.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite)
        .parquet(new Path(staging, name).toString)
    }
    import spark.implicits._
    params.toSeq.sortBy(_._1).toDF("k", "v")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(staging, ParamsRel).toString)
    var gen = genDirs(fs, rootP).headOption.map(_ + 1L).getOrElse(0L)
    beforeCommit(gen)
    // generation CAS: atomically claim the id (create-fails-if-exists);
    // a lost claim → re-scan, bump, retry into the next free slot
    var attempts = 0
    var claimed = false
    while (!claimed) {
      claimed =
        try { fs.create(claimPath(rootP, gen), false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!claimed) {
        attempts += 1
        if (attempts >= 64) {
          fs.delete(staging, true)
          throw new IllegalStateException(
            s"generation claim failed after $attempts races under $root")
        }
        val rescanned = genDirs(fs, rootP).headOption.map(_ + 1L).getOrElse(0L)
        gen = math.max(gen + 1L, rescanned)
      }
    }
    val genP = new Path(rootP, s"gen=$gen")
    require(fs.rename(staging, genP), s"generation commit rename failed: $genP")
    beforePointer(gen)
    // atomic pointer flip: tmp is complete before the old pointer goes
    val tmp = new Path(rootP, s".$LatestFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val latest = new Path(rootP, LatestFile)
    fs.delete(latest, false)
    require(fs.rename(tmp, latest), s"pointer rename failed: $latest")
    // retention: prune beyond `keep` generations (never the one just
    // committed — it sorts first), each with its claim marker; claims
    // BELOW the retained window with no surviving directory (crashed
    // between claim and rename) scrub too
    val retained = genDirs(fs, rootP)
    retained.drop(keep).foreach { g =>
      fs.delete(new Path(rootP, s"gen=$g"), true)
      fs.delete(claimPath(rootP, g), false)
    }
    val floor = retained.take(keep).lastOption.getOrElse(0L)
    val claims = fs.globStatus(new Path(rootP, ".gen-*.claim"))
    if (claims != null) claims.foreach { c =>
      scala.util.Try(c.getPath.getName
          .stripPrefix(".gen-").stripSuffix(".claim").toLong)
        .toOption.filter(_ < floor)
        .foreach(g => fs.delete(claimPath(rootP, g), false))
    }
    gen
  }

  private def pinnedGen(spark: SparkSession, root: String): Long =
    latestGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed model under $root"))

  /** Load one relation from the committed generation. */
  def loadRelation(spark: SparkSession, root: String, name: String): DataFrame =
    spark.read.parquet(s"$root/gen=${pinnedGen(spark, root)}/$name")

  /** Whether the committed generation carries relation `name` — for
    * maintenance flows whose output set depends on what the generation
    * was saved with (e.g. a PQ refresh re-encodes the optional `index`
    * relation only when the generation has one). */
  def hasRelation(spark: SparkSession, root: String, name: String): Boolean = {
    val p = new Path(s"$root/gen=${pinnedGen(spark, root)}/$name")
    fsFor(spark, p).exists(p)
  }

  /** Load the params map from the committed generation. */
  def loadParams(spark: SparkSession, root: String): Map[String, String] =
    loadRelation(spark, root, ParamsRel)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
}
