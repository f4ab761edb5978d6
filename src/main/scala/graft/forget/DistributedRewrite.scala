package graft.forget

import graft.find.Finder
import graft.find.Finder.GroupMatches
import graft.model._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{GroupType, PrimitiveType, Type => PType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DecimalLogicalTypeAnnotation, IntLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import java.util.UUID
import scala.util.control.NonFatal

/** Distributed Forget: ONE Spark job over the whole object queue, one task
  * per file, the rewrite performed INSIDE the task with parquet-mr / raw
  * streams — no per-file driver-scheduled Spark actions (VERDICT r2 "What's
  * wrong" #2: the thread-pool Forget issued ~3 driver jobs per object;
  * at the reference's scenario 4 — 45,300 objects,
  * /root/reference/docs/COST_OVERVIEW.md:288-290 — that is ~135k driver
  * jobs, where this is ONE job with 45,300 tasks).
  *
  * This is the Spark analog of the reference's Fargate fleet
  * (backend/ecs_tasks/delete_files/main.py:288-306: N containers × process
  * pool, one object per child): Spark's scheduler replaces SQS, executors
  * replace containers, and the per-object counts flow back through
  * accumulators + the collected task outcomes instead of DynamoDB events.
  *
  * Per-task semantics mirror the reference engine exactly:
  *   - parquet: stream rows, drop any row where a match group hits
  *     (parquet_handler.py:133-177), native-typed comparison with decimal
  *     coercion (parquet_handler.py:102-130) and case-insensitive
  *     dot-path resolution (parquet_handler.py:24-33,45-61); the output
  *     writer reuses the source schema and compression codec. Row-group
  *     boundaries are the writer's choice — documented deviation
  *     (SURVEY.md §7.4 risk 1).
  *   - JSON-lines: parse each line for the predicate only; survivors are
  *     written as the ORIGINAL line + '\n' (json_handler.py:49-72),
  *     gzip in/out by extension (main.py:172).
  *   - commit protocol: capture source (length, mtime) before reading,
  *     write survivors to a staging sibling, verify the source is
  *     unchanged, then swap — the local-FS analog of the reference's
  *     version-integrity check + rollback (s3.py:301-357).
  *   - zero-deletion on a found object is a hard error (main.py:182-187).
  */
object DistributedRewrite {

  /** Ships the driver's Hadoop configuration to tasks (fs.* credentials,
    * defaultFS, custom filesystem impls set via spark.hadoop.*); a bare
    * `new Configuration()` in the task would silently drop them.
    * `value` hands each caller its own copy — Configuration is not
    * thread-safe under mutation. */
  final class SerializableHadoopConf(
      @transient private var conf: Configuration) extends Serializable {
    def value: Configuration = new Configuration(conf)
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  // ------------------------------------------------------------------
  // Serializable match spec (built driver-side, shipped to tasks)
  // ------------------------------------------------------------------

  /** Native-typed match value, aligned with the declared column type the
    * same way Finder.typedGroups casts (one cast engine driver-side; the
    * task only compares). */
  sealed trait PVal extends Serializable
  final case class PLong(v: Long) extends PVal
  final case class PFloat(v: Float) extends PVal
  final case class PDouble(v: Double) extends PVal
  final case class PDecimal(v: java.math.BigDecimal) extends PVal
  final case class PString(v: String) extends PVal

  /** One column group's matches: dot-path segments per column + native
    * match tuples (tuples containing a null component are dropped —
    * null never matches, parquet_handler.py: `None in set` is False). */
  final case class TaskGroupSpec(paths: Seq[Seq[String]],
                                 tuples: Seq[Seq[PVal]]) extends Serializable

  /** Build task specs from cast-validated groups.
    * @throws MatchIdCastingError via Finder.typedGroups on bad match ids */
  def buildSpecs(spark: SparkSession,
                 groups: Seq[GroupMatches]): Seq[TaskGroupSpec] =
    Finder.typedGroups(spark, groups).map { tg =>
      val tuples = tg.native.flatMap { tuple =>
        val pvals = tuple.map {
          case null => null
          case b: Byte => PLong(b.toLong)
          case s: Short => PLong(s.toLong)
          case i: Int => PLong(i.toLong)
          case l: Long => PLong(l)
          case f: Float => PFloat(f)
          case d: Double => PDouble(d)
          case bd: java.math.BigDecimal => PDecimal(bd)
          case bd: BigDecimal => PDecimal(bd.bigDecimal)
          case s: String => PString(s)
          case other =>
            // identifier validation rejects date/timestamp/etc upstream
            // (Catalog.isAllowedIdentifierType); fail loudly rather than
            // silently string-compare a type the task cannot evaluate
            throw new IllegalArgumentException(
              s"unsupported native match type: ${other.getClass.getName}")
        }
        if (pvals.contains(null)) None else Some(pvals)
      }
      TaskGroupSpec(tg.group.columns.map(_.split('.').toSeq), tuples)
    }

  // ------------------------------------------------------------------
  // Task-side parquet value extraction + comparison
  // ------------------------------------------------------------------

  // ------------------------------------------------------------------
  // Local-filesystem fast path (★r21 optimization round)
  // ------------------------------------------------------------------
  //
  // On a local warehouse every Hadoop call goes through
  // ChecksumFileSystem: each open VERIFIES a .crc sidecar (re-reading
  // and CRC-ing the whole file), each create WRITES one, and
  // delete/rename double their syscalls to keep sidecars in step. The
  // rewrite task pays that tax ~6× per object (footer open, record
  // read, staged write, stat, swap, version copy) — pure overhead on a
  // many-small-object forget job, and the dominant per-object cost at
  // the 10k/40k soak rungs. Where the filesystem is local the task
  // now uses java.nio / parquet's LocalInputFile|LocalOutputFile
  // directly (no sidecars, no verification — integrity is the commit
  // protocol's own capture-check-swap job, mirroring S3 where there
  // are no sidecars either); any other FileSystem keeps the exact
  // Hadoop path. A swap must also drop a PRE-EXISTING stale sidecar
  // (e.g. the source object was written through ChecksumFileSystem):
  // content changed, so a later checksummed read would fail on it.

  /** The object's java.nio path when (and only when) its FileSystem is
    * the local one — the [[VersionedStore.localPath]] rule. */
  private def nioPath(fs: org.apache.hadoop.fs.FileSystem,
                      p: HPath): Option[java.nio.file.Path] =
    VersionedStore.localPath(fs, p)

  /** ChecksumFileSystem sidecar sibling (`.<name>.crc`). */
  private def crcSidecar(p: java.nio.file.Path): java.nio.file.Path =
    p.getParent.resolve("." + p.getFileName.toString + ".crc")

  /** Case-insensitive field index lookup (parquet_handler.py:24-33). */
  private def fieldIndex(gt: GroupType, name: String): Int = {
    var i = 0
    while (i < gt.getFieldCount) {
      if (gt.getType(i).getName.equalsIgnoreCase(name)) return i
      i += 1
    }
    -1
  }

  /** Resolve a dot path on a record; None when any segment is missing,
    * null, repeated, or crosses a non-group. */
  private def resolveLeaf(g: Group, path: Seq[String]): Option[(PrimitiveType, Group, Int)] = {
    var cur = g
    var i = 0
    while (i < path.length) {
      val gt = cur.getType
      val idx = fieldIndex(gt, path(i))
      if (idx < 0) return None
      val f = gt.getType(idx)
      if (f.isRepetition(PType.Repetition.REPEATED)) return None
      if (cur.getFieldRepetitionCount(idx) == 0) return None // null
      if (i == path.length - 1) {
        if (!f.isPrimitive) return None
        return Some((f.asPrimitiveType(), cur, idx))
      }
      if (f.isPrimitive) return None
      cur = cur.getGroup(idx, 0)
      i += 1
    }
    None
  }

  private def decimalScale(pt: PrimitiveType): Option[Int] =
    pt.getLogicalTypeAnnotation match {
      case d: DecimalLogicalTypeAnnotation => Some(d.getScale)
      case _ => None
    }

  /** Parquet UINT32/UINT64 logical types (Spark widens these to Long /
    * Decimal(20,0) on the driver-side Find; the task must widen the raw
    * signed storage the same way or upper-range ids match in Find but
    * not here). */
  private def isUnsignedInt(pt: PrimitiveType): Boolean =
    pt.getLogicalTypeAnnotation match {
      case i: IntLogicalTypeAnnotation => !i.isSigned
      case _ => false
    }

  private def binaryDecimal(b: Binary, scale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), scale)

  /** Native comparison of a parquet leaf against a match value — the task
    * analog of Spark's `col === lit(v)` with the reference's numeric
    * semantics: decimals compare by value regardless of scale
    * (Decimal('2547.4') == Decimal('2547.40'), parquet_handler.py:102-130);
    * float/double NaN equals NaN (Spark SQL NaN semantics, which the
    * driver-side Forget predicate also uses). */
  private def leafEquals(pt: PrimitiveType, g: Group, idx: Int, m: PVal): Boolean = {
    val scaleOpt = decimalScale(pt)
    pt.getPrimitiveTypeName match {
      case INT32 =>
        // UINT32 stores the unsigned value in signed INT32 bits; widen
        // exactly like Spark's vectorized reader (& 0xffffffffL) so the
        // task agrees with the driver-side Find on upper-range ids
        val widened =
          if (isUnsignedInt(pt)) g.getInteger(idx, 0) & 0xffffffffL
          else g.getInteger(idx, 0).toLong
        (m, scaleOpt) match {
          case (PDecimal(d), Some(s)) =>
            java.math.BigDecimal.valueOf(widened, s).compareTo(d) == 0
          case (PLong(v), None) => widened == v
          case _ => false
        }
      case INT64 =>
        val raw = g.getLong(idx, 0)
        val unsigned = isUnsignedInt(pt)
        (m, scaleOpt) match {
          case (PDecimal(d), Some(s)) =>
            java.math.BigDecimal.valueOf(raw, s).compareTo(d) == 0
          case (PDecimal(d), None) if unsigned =>
            // UINT64 surfaces as Decimal(20,0) in Spark; compare on the
            // unsigned reading of the raw signed long
            new java.math.BigDecimal(java.lang.Long.toUnsignedString(raw))
              .compareTo(d) == 0
          case (PLong(v), None) =>
            // an unsigned value > Long.MaxValue can never equal a PLong
            if (unsigned) raw >= 0 && raw == v else raw == v
          case _ => false
        }
      case FLOAT => m match {
        case PFloat(v) =>
          val x = g.getFloat(idx, 0)
          (x.isNaN && v.isNaN) || x == v
        case PDouble(v) =>
          val x = g.getFloat(idx, 0)
          (x.isNaN && v.isNaN) || x.toDouble == v
        case _ => false
      }
      case DOUBLE => m match {
        case PDouble(v) =>
          val x = g.getDouble(idx, 0)
          (x.isNaN && v.isNaN) || x == v
        case PFloat(v) =>
          val x = g.getDouble(idx, 0)
          (x.isNaN && v.isNaN) || x == v.toDouble
        case _ => false
      }
      case BINARY | FIXED_LEN_BYTE_ARRAY => (m, scaleOpt) match {
        case (PDecimal(d), Some(s)) =>
          binaryDecimal(g.getBinary(idx, 0), s).compareTo(d) == 0
        case (PString(v), None) => g.getString(idx, 0) == v
        case _ => false
      }
      case _ => false // BOOLEAN/INT96 are not identifier types
    }
  }

  /** True when the record matches any group (all of the group's columns
    * present AND some tuple equal on every column). */
  private[forget] def recordMatches(g: Group, specs: Seq[TaskGroupSpec]): Boolean =
    specs.exists { spec =>
      val leaves = spec.paths.map(resolveLeaf(g, _))
      leaves.forall(_.isDefined) && spec.tuples.exists { tuple =>
        var i = 0
        var all = true
        while (all && i < tuple.length) {
          val (pt, grp, idx) = leaves(i).get
          all = leafEquals(pt, grp, idx, tuple(i))
          i += 1
        }
        all
      }
    }

  // ------------------------------------------------------------------
  // Task-side file rewrites
  // ------------------------------------------------------------------

  /** Staging sibling name grammar (fixed-width fields, so the parse is
    * unambiguous even when object names or job ids contain dashes):
    *
    *   `.graft-staging-` (15) + uuid (36) + `-` + jobTag (16) + `-` + destName
    *
    * The job tag records WHICH run staged the file — diagnostic
    * provenance for crash debris (the reclamation itself is
    * tag-blind: by the time the post-job pass runs, every staging
    * file in the directory is dead). Dot-prefixed names are hidden
    * from Spark/Hadoop input listings, so an orphan is a disk leak,
    * never reader-visible corruption — but a leak per crashed task is
    * real storage at 100 TB, and without the pass nothing ever
    * reclaims it (every attempt stages under a fresh uuid). */
  private val StagingPrefix = ".graft-staging-"
  private val StagingNameStart = StagingPrefix.length + 36 + 1 + 16 + 1 // 69

  /** 16-hex job tag (two murmur passes) for staging-name provenance. */
  private[forget] def jobTag(jobId: String): String =
    f"${scala.util.hashing.MurmurHash3.stringHash(jobId)}%08x" +
      f"${scala.util.hashing.MurmurHash3.stringHash(jobId.reverse)}%08x"

  private def stagingPath(dest: HPath, tag: String): HPath =
    new HPath(dest.getParent,
      s"$StagingPrefix${UUID.randomUUID()}-$tag-${dest.getName}")

  // Dead-run debris (staging orphans from a task that died between its
  // staging write and swap; idempotency markers a job that aborted
  // before its own sweep left behind) is reclaimed in the POST-JOB
  // directory pass below — ONE listing per parent directory, never a
  // per-task list: a per-object sweep re-lists the shared directory
  // O(N²) times for N co-located objects, which at the 40,960-object
  // soak scale is ~1.7e9 file-status calls (the exact trap the marker
  // sweep's history documents — measured 27 s of a 34 s job at 1,024
  // objects, and a wall the first cut of THIS feature hit at 40k).

  /** Per-(object, job) commit marker making the task idempotent under
    * Spark retry/speculation: a re-executed attempt whose predecessor
    * already committed (executor lost before reporting) would otherwise
    * re-read the rewritten object, find 0 matches, and fail the job with
    * a spurious ZeroDeletionError. The marker stores the committed
    * (processed, deleted) counts so the retry can replay the outcome.
    * The commit→marker write is not atomic, so the path stays
    * at-least-once in a crash window — the same guarantee the
    * reference's SQS redelivery gives its Fargate workers. */
  private[forget] def doneMarker(dest: HPath, jobId: String): HPath =
    new HPath(dest.getParent,
      new HPath(".graft-done", s"${dest.getName}.$jobId"))

  private[forget] def writeDoneMarker(fs: org.apache.hadoop.fs.FileSystem,
                              m: HPath, processed: Long,
                              deleted: Long): Unit = {
    val bytes = s"$processed,$deleted".getBytes("UTF-8")
    VersionedStore.localPath(fs, m) match {
      case Some(p) =>
        // java.nio for local paths: a Hadoop LocalFileSystem create costs
        // ~25 ms (crc sidecar + permission bookkeeping) — pure overhead
        // on a 10-byte marker, ×1 per object per job.
        // Write-first, mkdir only on miss (★r22): createDirectories
        // issues a real mkdir syscall per call even when the directory
        // exists (EEXIST under the parent's inode write lock) — at the
        // 40k-object soak that serialized 32 task threads on one
        // directory mutex (thread-sampled: mkdir0 was the 2nd-hottest
        // frame). The marker dir exists for every object after the
        // first, so the common case is now one open syscall.
        try java.nio.file.Files.write(p, bytes)
        catch {
          case _: java.nio.file.NoSuchFileException =>
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p, bytes)
        }
      case None =>
        val out = fs.create(m, true)
        try out.write(bytes) finally out.close()
    }
    ()
  }

  private def readDoneMarker(fs: org.apache.hadoop.fs.FileSystem,
                             m: HPath): (Long, Long) = {
    val in = fs.open(m)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val parts = s.split(',')
    (parts(0).toLong, parts(1).toLong)
  }

  /** Capture-check-swap commit (reference s3.py:61-98,301-357 semantics
    * on a Hadoop FileSystem): integrity check against the captured source
    * version, snapshot the object into its version store (the versioned
    * PUT), swap, restore-from-version on a failed swap, and purge old
    * versions when the mapper allows (DeleteOldVersions, s3.py:244-281).
    * The delete+rename pair is not atomic — the same overwrite window an
    * S3 PUT has; the integrity check + version restore bound it. */
  private def commitTask(conf: Configuration, src: HPath, dest: HPath,
                         staged: HPath, srcLen: Long, srcMtime: Long,
                         deleteOldVersions: Boolean): Unit = {
    val fs = src.getFileSystem(conf)
    val st = fs.getFileStatus(src)
    if (st.getLen != srcLen || st.getModificationTime != srcMtime) {
      fs.delete(staged, false)
      throw new IntegrityCheckError(
        s"$src changed during rewrite (len ${st.getLen}!=$srcLen or mtime " +
          s"${st.getModificationTime}!=$srcMtime) — rolled back")
    }
    val nioDest = nioPath(fs, dest)
    val nioStaged = nioPath(fs, staged)
    // Version capture (★r22 scale fix): when the swap below is the
    // ATOMIC local-FS rename AND the mapper purges versions anyway
    // (deleteOldVersions), the capture→swap→purge sequence nets to
    // NOTHING on success — the snapshot exists only to roll back a
    // failed swap, and an atomic rename either fully replaces dest or
    // leaves it untouched (there is no partial state to restore).
    // Skipping it drops ~8 directory-metadata syscalls per object
    // (mkdir×2, copy open/creat, unlink, rmdir, list) that all
    // serialize on the SHARED .graft-versions parent inode lock —
    // thread-sampled as the top wall consumer at the 40,960-object
    // soak (delete0/mkdir0/open0 frames). Version-store state after
    // the job is byte-identical: none in either case (the purge still
    // runs and still clears any PRIOR job's versions). The capture
    // stays for: deleteOldVersions=false (versions must accumulate —
    // the S3 versioned-PUT analog), and every non-local FileSystem
    // (the delete+rename pair is not atomic, so the snapshot is the
    // rollback guarantee there).
    val atomicSwap = nioDest.isDefined && nioStaged.isDefined
    val captured =
      if (atomicSwap && deleteOldVersions) None
      else VersionedStore.capture(fs, dest)
    (nioDest, nioStaged) match {
      case (Some(destNio), Some(stagedNio)) =>
        // one atomic same-directory rename replaces the delete+rename
        // pair (no reader-visible missing-object window on local FS);
        // a stale checksum sidecar of the OLD content goes first.
        // ATOMIC_MOVE (★r22, ADVICE r21): without it the JDK may
        // silently fall back to copy+delete (non-atomic,
        // reader-visible partial state) if the move ever crosses file
        // stores — staging is same-directory today, so this makes a
        // future violation fail loudly (AtomicMoveNotSupportedException
        // feeds the existing rollback path) instead of degrading.
        try {
          java.nio.file.Files.deleteIfExists(crcSidecar(destNio))
          java.nio.file.Files.move(stagedNio, destNio,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } catch {
          case NonFatal(e) =>
            java.nio.file.Files.deleteIfExists(stagedNio) // never leak
            val restored =
              captured.isDefined && VersionedStore.rollback(fs, dest)
            if (captured.isDefined && !restored)
              throw new RollbackFailedError(
                s"rename $staged -> $dest failed AND version restore failed",
                null, e)
            throw new IllegalStateException(
              if (captured.isDefined)
                s"rename $staged -> $dest failed (rolled back to prior " +
                  s"version): $e"
              else
                s"rename $staged -> $dest failed ($dest unchanged — " +
                  s"atomic move): $e")
        }
      case _ =>
        if (fs.exists(dest) && !fs.delete(dest, false)) {
          fs.delete(staged, false)
          throw new IllegalStateException(s"could not replace $dest")
        }
        if (!fs.rename(staged, dest)) {
          fs.delete(staged, false) // never leak the staging copy
          val restored =
            captured.isDefined && VersionedStore.rollback(fs, dest)
          if (captured.isDefined && !restored)
            throw new RollbackFailedError(
              s"rename $staged -> $dest failed AND version restore failed",
              null,
              new IllegalStateException(s"rename $staged -> $dest failed"))
          throw new IllegalStateException(
            s"rename $staged -> $dest failed (rolled back to prior version)")
        }
    }
    if (deleteOldVersions) VersionedStore.deleteOldVersions(fs, dest)
  }

  /** Serializable task outcome, turned into JobEvents driver-side. */
  final case class TaskOutcome(path: String, ok: Boolean,
                               processed: Long, deleted: Long, ms: Long,
                               rollbackFailed: Boolean, error: String,
                               originalError: String,
                               skipped: Boolean = false)

  // ------------------------------------------------------------------
  // The one-job driver entry
  // ------------------------------------------------------------------

  /** Task-side per-object rewrite strategy: how ONE object's records
    * are turned into its staged replacement. The surrounding machinery
    * — staging paths, CSE envelope, versioned commit, idempotency
    * markers, marker sweep, events — is identical for every strategy;
    * [[run]] (row deletion) and a text-redaction rewrite
    * ([[graft.llm.PiiForget]]) differ ONLY here. Implementations must
    * be Serializable (they ship to executors). Returns
    * (rowsProcessed, rowsChanged); `rowsChanged == 0` on a Found object
    * is the Find/rewrite-inconsistency hard error (reference
    * main.py:182-187), worded by [[zeroChangeMessage]]. */
  private[graft] trait TaskRewrite extends Serializable {
    def parquet(conf: Configuration, src: HPath, staged: HPath): (Long, Long)
    def json(conf: Configuration, src: HPath, staged: HPath): (Long, Long)
    def zeroChangeMessage(path: String): String
  }

  /** The deletion strategy behind [[run]] (`private[forget]` so the
    * crash-recovery spec can wrap it with an injected post-staging
    * failure). */
  private[forget] final class DeleteRewrite(pqSpecs: Seq[TaskGroupSpec],
                                            jsonEval: JsonMatch.Evaluator)
      extends TaskRewrite {
    def parquet(conf: Configuration, src: HPath, staged: HPath): (Long, Long) =
      rewriteParquetTaskTo(conf, src, staged, pqSpecs)
    def json(conf: Configuration, src: HPath, staged: HPath): (Long, Long) =
      rewriteJsonTaskTo(conf, src, staged, jsonEval)
    def zeroChangeMessage(path: String): String =
      s"$path was found by Find but Forget deleted 0 rows"
  }

  /** Rewrite every work unit in ONE Spark job (one task per file).
    * Returns the job events (sorted by sk); live progress is visible on
    * the two accumulators (`graft.forget.rowsProcessed|rowsDeleted`).
    * Match-group cast validation ([[buildSpecs]]) runs BEFORE the
    * empty-units short-circuit — intentionally fail-fast: an
    * uncastable match id is a configuration error worth surfacing
    * even when the queue is empty (so `run(_, _, Nil, badGroups)`
    * throws [[graft.model.MatchIdCastingError]], not Nil). */
  def run(spark: SparkSession, jobId: String, units: Seq[ObjectWorkUnit],
          groups: Seq[GroupMatches],
          outPathFor: String => Option[String] = _ => None,
          codec: PayloadCodec = PayloadCodec.Identity): Seq[JobEvent] = {
    val pqSpecs = buildSpecs(spark, groups) // driver-side cast validation
    val jsonEval = new JsonMatch.Evaluator(groups.map(JsonMatch.spec))
    runWith(spark, jobId, units, new DeleteRewrite(pqSpecs, jsonEval),
      outPathFor, codec)
  }

  /** Generic job body shared by every [[TaskRewrite]] strategy. */
  private[graft] def runWith(spark: SparkSession, jobId: String,
                             units: Seq[ObjectWorkUnit],
                             rewrite: TaskRewrite,
                             outPathFor: String => Option[String] = _ => None,
                             codec: PayloadCodec = PayloadCodec.Identity)
      : Seq[JobEvent] = {
    if (units.isEmpty) return Nil
    val accProcessed = spark.sparkContext.longAccumulator("graft.forget.rowsProcessed")
    val accDeleted = spark.sparkContext.longAccumulator("graft.forget.rowsDeleted")

    val work: Seq[(ObjectWorkUnit, String)] = units.map { u =>
      val srcPath = Forget.stripScheme(u.path)
      (u, outPathFor(u.path).map(Forget.stripScheme).getOrElse(srcPath))
    }

    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val tag = jobTag(jobId)
    // Task granularity (★r22, VERDICT r21 #1): one task per object put
    // the SCHEDULER on the critical path at soak scale — 40,960 tasks
    // cost ~1 ms each to dispatch, so the 32-core wall sat at 42 s
    // against a ~10 s compute floor (cpu/wall ≈ 7-9, and c8 ≈ c32).
    // Batch k objects per task instead. Per-object semantics are
    // untouched: every contract (failure isolation, idempotency
    // markers, rollback, zero-deletion, accumulators) already lives in
    // the per-object body below, which catches everything and emits
    // one TaskOutcome per object — a batch neighbor's failure cannot
    // fail this object, and a retried/speculated batch replays each
    // committed member from its own done marker exactly as the
    // one-task-per-object shape did. k is scale-adaptive (targets
    // 8 task waves per core so stragglers amortize — a fixed k would
    // under-split small queues or leave 40k tasks at soak scale),
    // bounded to 32 objects so one retry never redoes more than that,
    // and overridable via `graft.forget.objectsPerTask` (set 1 to
    // restore the exact former dispatch).
    val objectsPerTask: Int = {
      val auto = math.ceil(work.size.toDouble /
        (spark.sparkContext.defaultParallelism.toDouble * 8)).toInt
      spark.conf.getOption("graft.forget.objectsPerTask")
        .map(_.toInt).getOrElse(math.min(32, math.max(1, auto)))
    }
    val numSlices = math.max(1,
      math.ceil(work.size.toDouble / objectsPerTask).toInt)
    val outcomes = spark.sparkContext
      .parallelize(work, numSlices) // k objects per task (see above)
      .mapPartitions { it =>
        // ONE Configuration copy per task, not per object (★r22): the
        // copy ctor re-walks the source's property overlay under its
        // monitor — per-object copies burned ~1-2 ms of cpu each and
        // thread-sampled as BLOCKED contention on the shared broadcast
        // value at soak scale. Single-threaded within the task, so the
        // objects of one batch can safely share the copy.
        val conf = confBc.value.value
        it.map { case (u, destStr) =>
        val t0 = System.currentTimeMillis()
        val src = new HPath(Forget.stripScheme(u.path))
        val dest = new HPath(destStr)
        try {
          val fs = src.getFileSystem(conf)
          // ONE stat answers both "does it exist" and the later
          // len/mtime capture (the former exists + getFileStatus pair)
          val stOpt =
            try Some(fs.getFileStatus(src))
            catch { case _: java.io.FileNotFoundException => None }
          val mfs = dest.getFileSystem(conf)
          val marker = doneMarker(dest, jobId)
          val markerExists = nioPath(mfs, marker) match {
            case Some(p) => java.nio.file.Files.exists(p)
            case None => mfs.exists(marker)
          }
          if (stOpt.isEmpty && u.ignoreObjectNotFound)
            // reference main.py:213-231: missing object + the mapper's
            // IgnoreObjectNotFoundExceptions flag ⇒ skip, not fail
            TaskOutcome(u.path, ok = false, 0, 0,
              System.currentTimeMillis() - t0, rollbackFailed = false,
              s"${u.path} not found (skipped)", "", skipped = true)
          else if (markerExists) {
            // a prior attempt of THIS job already committed this object
            // (executor lost before reporting / speculative duplicate):
            // replay its recorded counts instead of re-rewriting —
            // Spark dropped the lost attempt's accumulator updates
            val (p0, d0) =
              readDoneMarker(dest.getFileSystem(conf), doneMarker(dest, jobId))
            accProcessed.add(p0)
            accDeleted.add(d0)
            TaskOutcome(u.path, ok = true, p0, d0,
              System.currentTimeMillis() - t0, rollbackFailed = false, "", "")
          } else {
          // missing object without the ignore flag: re-raise the real
          // FileNotFoundException the former getFileStatus threw here
          val st = stOpt.getOrElse(fs.getFileStatus(src))
          val (srcLen, srcMtime) = (st.getLen, st.getModificationTime)
          val staged = stagingPath(dest, tag)
          // CSE seam (cse.py:27-36,85-104): decode the envelope to an
          // EXECUTOR-LOCAL plaintext copy (plain java.io — never the
          // source filesystem, which may be a remote shared store),
          // rewrite that, re-encode the output. The finally below
          // guarantees decrypted plaintext never survives a failed task.
          val plainLocal: Option[java.io.File] =
            if (codec eq PayloadCodec.Identity) None
            else {
              val tmp =
                java.io.File.createTempFile("graft-cse-", "-" + src.getName)
              val in = fs.open(src)
              val bytes = try in.readAllBytes() finally in.close()
              val os = new java.io.FileOutputStream(tmp)
              try os.write(codec.decode(bytes)) finally os.close()
              Some(tmp)
            }
          try {
            val plainSrc =
              plainLocal.map(f => new HPath(f.toURI)).getOrElse(src)
            val (processed, deleted) = u.format match {
              case DataFormat.Parquet =>
                rewrite.parquet(conf, plainSrc, staged)
              case DataFormat.JsonLines =>
                rewrite.json(conf, plainSrc, staged)
            }
            if (!(codec eq PayloadCodec.Identity)) {
              val sfs = staged.getFileSystem(conf)
              try {
                val in = sfs.open(staged)
                val plain = try in.readAllBytes() finally in.close()
                val out = sfs.create(staged, true)
                try out.write(codec.encode(plain)) finally out.close()
              } catch {
                case NonFatal(e) => sfs.delete(staged, false); throw e
              }
            }
            if (deleted == 0L) {
              fs.delete(staged, false)
              throw new ZeroDeletionError(rewrite.zeroChangeMessage(u.path))
            }
            commitTask(conf, src, dest, staged, srcLen, srcMtime,
              u.deleteOldVersions)
            writeDoneMarker(dest.getFileSystem(conf),
              doneMarker(dest, jobId), processed, deleted)
            accProcessed.add(processed)
            accDeleted.add(deleted)
            TaskOutcome(u.path, ok = true, processed, deleted,
              System.currentTimeMillis() - t0, rollbackFailed = false, "", "")
          } finally plainLocal.foreach { f => if (f.exists()) f.delete() }
          }
        } catch {
          case e: RollbackFailedError =>
            TaskOutcome(u.path, ok = false, 0, 0,
              System.currentTimeMillis() - t0, rollbackFailed = true,
              e.getMessage,
              Option(e.original).map(_.getMessage).getOrElse(""))
          case NonFatal(e) =>
            TaskOutcome(u.path, ok = false, 0, 0,
              System.currentTimeMillis() - t0, rollbackFailed = false,
              String.valueOf(e.getMessage), "")
        }
        }
      }
      .collect()

    // all attempts/retries are finished once collect() returns — sweep the
    // per-job commit markers (best-effort, map-only, no shuffle). ONE
    // pass per parent DIRECTORY — list once, delete this job's markers,
    // one emptiness re-check — never per object: a per-object sweep
    // re-lists the shared marker dir O(N²) times for N co-located
    // objects (measured: 27 s of a 34 s job at 1,024 objects in one
    // prefix).
    val markerDirs = work.map { case (_, destStr) =>
      new HPath(new HPath(destStr).getParent, ".graft-done").toString
    }.distinct
    spark.sparkContext
      .parallelize(markerDirs, math.max(1, math.min(markerDirs.size, 64)))
      .foreach { dirStr =>
        val conf = confBc.value.value
        try {
          val dir = new HPath(dirStr)
          val dfs = dir.getFileSystem(conf)
          if (dfs.exists(dir)) {
            // EVERY marker in a directory this job touched goes: our
            // own are consumed (all attempts finished once collect()
            // returned), and a foreign one is an ABORTED run's leak —
            // its job died between a task's commit and its own sweep.
            // Safe under the one-concurrent-job invariant
            // (GraftApi.startJob): no other job is live while this
            // pass runs, so no marker here can be awaiting replay.
            dfs.listStatus(dir).foreach(st =>
              dfs.delete(st.getPath, false))
            // non-recursive: refuses (harmlessly) if a concurrent job
            // added markers between the list and this check
            if (dfs.listStatus(dir).isEmpty) dfs.delete(dir, false)
          }
          // reclaim ALL staging debris in the data dir (★r20 crash
          // axis): own-tag files are a failed attempt's leftovers
          // (every live attempt is done), foreign-tag files are a
          // dead prior run's orphans — a task that died between its
          // staging write and swap. Dot-prefixed names are invisible
          // to readers, so until a job passes through this directory
          // the orphan is a disk leak, never corruption.
          val dataDir = dir.getParent
          dfs.listStatus(dataDir).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith(StagingPrefix) && n.length > StagingNameStart)
              dfs.delete(st.getPath, false)
          }
        } catch { case NonFatal(_) => () }
      }

    def sk(): String = EventSk.next()
    outcomes.toSeq.flatMap { o =>
      if (o.ok)
        Seq(JobEvent(jobId, sk(), JobEventName.ObjectUpdated,
          System.currentTimeMillis(), statsProcessed = o.processed,
          statsDeleted = o.deleted, timeTakenMs = o.ms, path = o.path))
      else if (o.skipped)
        Seq(JobEvent(jobId, sk(), JobEventName.ObjectUpdateSkipped,
          System.currentTimeMillis(), path = o.path, error = o.error))
      else if (o.rollbackFailed) {
        val orig =
          if (o.originalError.nonEmpty)
            Seq(JobEvent(jobId, sk(), JobEventName.ObjectUpdateFailed,
              System.currentTimeMillis(), path = o.path,
              error = o.originalError))
          else Nil
        orig :+ JobEvent(jobId, sk(), JobEventName.ObjectRollbackFailed,
          System.currentTimeMillis(), path = o.path, error = o.error)
      } else
        Seq(JobEvent(jobId, sk(), JobEventName.ObjectUpdateFailed,
          System.currentTimeMillis(), path = o.path, error = o.error))
    }.sortBy(_.sk)
  }

  /** parquet-mr reader/writer endpoints on the fastest correct IO
    * path: java.nio-backed LocalInputFile/LocalOutputFile on a local
    * FileSystem (no ChecksumFileSystem sidecar verify/write — see the
    * fast-path note above), the Hadoop file abstractions anywhere
    * else. Shared with [[graft.llm.PiiForget]]'s scrub rewrite. */
  private[graft] def parquetInput(conf: Configuration,
                                  src: HPath): org.apache.parquet.io.InputFile =
    nioPath(src.getFileSystem(conf), src) match {
      case Some(p) => new org.apache.parquet.io.LocalInputFile(p)
      case None => HadoopInputFile.fromPath(src, conf)
    }

  /** Every ParquetReader.Builder ctor except (InputFile,
    * ParquetConfiguration) — and ParquetFileReader.open's no-options
    * overload — eagerly constructs a FRESH `new Configuration()`,
    * which re-parses core-default.xml/core-site.xml out of the jars
    * (~8 ms, measured by the PerfProbe `forgettask` sampler: the
    * "footer open" phase was Inflater + woodstox XML frames, not
    * parquet). On a many-small-object forget job that tax lands
    * twice PER OBJECT; both call sites below thread the task's
    * existing conf instead. */
  private[graft] def groupReader(conf: Configuration,
                                 src: HPath): ParquetReader[Group] =
    new ParquetReader.Builder[Group](parquetInput(conf, src),
        new org.apache.parquet.conf.HadoopParquetConfiguration(conf)) {
      override def getReadSupport()
          : org.apache.parquet.hadoop.api.ReadSupport[Group] =
        new GroupReadSupport()
    }.build()

  /** Footer read reusing the caller's conf (see [[groupReader]]). */
  private[graft] def readFooter(conf: Configuration, src: HPath)
      : org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    val r = ParquetFileReader.open(parquetInput(conf, src),
      org.apache.parquet.HadoopReadOptions.builder(conf).build())
    try r.getFooter finally r.close()
  }

  private[graft] def groupWriterBuilder(conf: Configuration, staged: HPath)
      : org.apache.parquet.hadoop.example.ExampleParquetWriter.Builder =
    (nioPath(staged.getFileSystem(conf), staged) match {
      case Some(p) =>
        ExampleParquetWriter.builder(new org.apache.parquet.io.LocalOutputFile(p))
      case None => ExampleParquetWriter.builder(staged)
    }).withConf(conf)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)

  /** Best-effort staged-file cleanup (error paths). */
  private[graft] def deleteStaged(conf: Configuration, staged: HPath): Unit = {
    val fs = staged.getFileSystem(conf)
    nioPath(fs, staged) match {
      case Some(p) => java.nio.file.Files.deleteIfExists(p); ()
      case None => fs.delete(staged, false); ()
    }
  }

  /** Dev-probe instrumentation ([[graft.tools.PerfProbe]] `forgettask`):
    * runs one object's task-body phases sequentially with per-phase
    * nanosecond accumulators, so the soak rungs' per-object cpu has a
    * phase budget. Never used by the job path. */
  val probeTimers: scala.collection.mutable.LinkedHashMap[String, Long] =
    scala.collection.mutable.LinkedHashMap.empty
  private def probeTime[A](k: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    probeTimers(k) = probeTimers.getOrElse(k, 0L) + (System.nanoTime() - t0)
    r
  }
  def probeParquetInput(conf: Configuration,
                        src: HPath): org.apache.parquet.io.InputFile =
    parquetInput(conf, src)
  def probeTaskBody(conf: Configuration, path: String,
                    specs: Seq[TaskGroupSpec]): Unit = {
    // Destructive by design (commits the rewrite over its input with
    // deleteOldVersions = true) — refuse anything outside the system
    // temp directory so a mispointed probe cannot eat real data
    // (★r22, ADVICE r21).
    val tmpRoot = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir")).toRealPath()
    val real = java.nio.file.Paths.get(path).toRealPath()
    require(real.startsWith(tmpRoot),
      s"probeTaskBody refuses non-temp path $path (probe staging only)")
    val src = new HPath(path)
    val dest = src
    val fs = probeTime("stat") {
      val f = src.getFileSystem(conf); f.getFileStatus(src); f
    }
    val st = fs.getFileStatus(src)
    probeTime("marker_check") {
      nioPath(fs, doneMarker(dest, "probe")) match {
        case Some(p) => java.nio.file.Files.exists(p)
        case None => fs.exists(doneMarker(dest, "probe"))
      }
    }
    val staged = stagingPath(dest, jobTag("probe"))
    probeTime("footer") { readFooter(conf, src) }
    probeTime("reader_only") {
      val r = groupReader(conf, src)
      try { var g = r.read(); while (g != null) g = r.read() }
      finally r.close()
    }
    probeTime("rewrite") {
      rewriteParquetTaskTo(conf, src, staged, specs)
    }
    probeTime("commit") {
      commitTask(conf, src, dest, staged, st.getLen,
        st.getModificationTime, deleteOldVersions = true)
    }
    probeTime("marker_write") {
      writeDoneMarker(fs, doneMarker(dest, "probe"), 1L, 1L)
    }
  }

  /** Variants writing directly to a given staging path (no commit). */
  private def rewriteParquetTaskTo(conf: Configuration, src: HPath,
                                   staged: HPath,
                                   specs: Seq[TaskGroupSpec]): (Long, Long) = {
    val footer = readFooter(conf, src)
    val schema = footer.getFileMetaData.getSchema
    val codec =
      if (footer.getBlocks.isEmpty || footer.getBlocks.get(0).getColumns.isEmpty)
        CompressionCodecName.SNAPPY
      else footer.getBlocks.get(0).getColumns.get(0).getCodec
    var processed = 0L
    var deleted = 0L
    val reader: ParquetReader[Group] = groupReader(conf, src)
    try {
      val writer: ParquetWriter[Group] = groupWriterBuilder(conf, staged)
        .withType(schema)
        .withCompressionCodec(codec)
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          processed += 1
          if (recordMatches(g, specs)) deleted += 1 else writer.write(g)
          g = reader.read()
        }
      } finally writer.close()
      (processed, deleted)
    } catch {
      case NonFatal(e) =>
        deleteStaged(conf, staged) // no partial staging
        throw e
    } finally reader.close()
  }

  /** Streaming line-at-a-time JSON rewrite: constant memory regardless of
    * (decompressed) object size — one pass splitting on '\n' bytes, the
    * raw line bytes written through verbatim + '\n' (json_handler.py:70;
    * the final unterminated line still counts, boto_utils.py:251-256).
    * Partial staged output is deleted on failure. */
  /** Raw byte stream endpoints on the fastest correct IO path (the
    * [[parquetInput]] rule for line-format rewrites); the nio output
    * is buffered because line rewrites issue many small writes. */
  private[graft] def byteSource(conf: Configuration,
                                src: HPath): java.io.InputStream =
    nioPath(src.getFileSystem(conf), src) match {
      case Some(p) => java.nio.file.Files.newInputStream(p)
      case None => src.getFileSystem(conf).open(src)
    }

  private[graft] def byteSink(conf: Configuration,
                              staged: HPath): java.io.OutputStream =
    nioPath(staged.getFileSystem(conf), staged) match {
      case Some(p) => new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(p), 1 << 16)
      case None => staged.getFileSystem(conf).create(staged, true)
    }

  private def rewriteJsonTaskTo(conf: Configuration, src: HPath,
                                staged: HPath,
                                ev: JsonMatch.Evaluator): (Long, Long) = {
    import java.util.zip.{GZIPInputStream, GZIPOutputStream}
    val gz = src.getName.endsWith(".gz")
    var processed = 0L
    var deleted = 0L
    val in = {
      val raw = byteSource(conf, src)
      if (gz) new GZIPInputStream(raw, 1 << 16) else raw
    }
    try {
      val outRaw = byteSink(conf, staged)
      val out = if (gz) new GZIPOutputStream(outRaw, 1 << 16) else outRaw
      try {
        val buf = new Array[Byte](1 << 16)
        val line = new java.io.ByteArrayOutputStream(1 << 12)
        def flushLine(): Unit = {
          val bytes = line.toByteArray
          line.reset()
          processed += 1
          val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          val isMatch =
            try ev.matches(s)
            catch {
              case e: IllegalArgumentException =>
                // reference error carries the line number
                // (boto_utils.py:255-263)
                throw new IllegalArgumentException(
                  s"Serialization error when parsing JSON lines: " +
                    s"line $processed: ${e.getMessage}", e)
            }
          if (isMatch) deleted += 1
          else { out.write(bytes); out.write('\n') }
        }
        var n = in.read(buf)
        while (n >= 0) {
          var start = 0
          var i = 0
          while (i < n) {
            if (buf(i) == '\n') {
              line.write(buf, start, i - start)
              flushLine()
              start = i + 1
            }
            i += 1
          }
          if (start < n) line.write(buf, start, n - start)
          n = in.read(buf)
        }
        if (line.size() > 0) flushLine() // no trailing newline
      } finally out.close()
      (processed, deleted)
    } catch {
      case NonFatal(e) => deleteStaged(conf, staged); throw e
    } finally in.close()
  }
}
