package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ZOrder

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Rows the parquet reader actually emitted (post row-group-stats
    * skipping, pre any residual Filter) for the one scan in `df`. */
  private def scanRows(df: DataFrame): Long = {
    df.collect() // run THIS queryExecution so its scan metric populates
    // (count() would plan and run a separate execution, leaving ours 0)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
    scans.head.metrics("numOutputRows").value
  }

  test("partitioned write/read round-trips rows and prunes directories") {
    val dir = Files.createTempDirectory("graft-layout-spec").toString
    val df = (1 to 1000).map(i => (i.toLong, i % 10, s"p$i")).toDF("id", "bucket", "payload")
    Layout.writePartitioned(df, dir, "bucket")
    // one directory per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).sorted
    assert(dirs.length == 10, s"expected 10 partition dirs, got ${dirs.toSeq}")
    val back = Layout.readPartitioned(spark, dir)
    assert(back.count() == 1000)
    // a partition-column filter lands in PartitionFilters, and only the
    // matching rows come back
    val filtered = back.filter(col("bucket") === 3)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
        plan.substring(plan.indexOf("PartitionFilters: [")).take(120).contains("bucket"),
      s"bucket filter not a partition filter:\n$plan")
    assert(filtered.count() == 100)
  }

  test("compact merges small files shuffle-free and preserves every row") {
    val base = Files.createTempDirectory("graft-compact-spec").toString
    val df = (1 to 5000).map(i => (i.toLong, s"payload-$i")).toDF("id", "p")
    df.repartition(32).write.parquet(s"$base/small")
    def files(d: String) = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(files(s"$base/small") == 32)
    val smallBytes = new java.io.File(s"$base/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = Layout.compact(spark, s"$base/small", s"$base/big", smallBytes / 4)
    // sized from actual bytes: ceil(bytes / floor(bytes/4)) ∈ {4, 5};
    // coalesce may write fewer when a merged partition lands empty
    assert(n >= 4 && n <= 5, s"planned file count $n not from layout bytes")
    val written = files(s"$base/big")
    assert(written <= n && written >= 1 && written < 32,
      s"expected ≤$n compacted files, got $written")
    val out = spark.read.parquet(s"$base/big").as[(Long, String)].collect().toSet
    assert(out == (1 to 5000).map(i => (i.toLong, s"payload-$i")).toSet,
      "compaction must preserve row multiset exactly")
    // the compaction plan itself must never shuffle: coalesce, not
    // repartition — read-concat-write is the whole contract
    val plan = spark.read.parquet(s"$base/small").coalesce(4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction plan shuffles:\n$plan")
  }

  test("zorder_key interleaves bits with col 0 in the low position") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 2L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zKey(spark, 16, col("a"), col("b")).as("z"))
    // (a=0b11, b=0b00) -> 0b0101; (a=0b00, b=0b11) -> 0b1010;
    // (a=0b01, b=0b10) -> 0b1001; all-ones interleaves to 32 ones
    assert(df.as[Long].collect().toSeq ==
      Seq(5L, 10L, 9L, (1L << 32) - 1))
  }

  test("z-ordered layout skips row groups on the SECOND dimension; linear can't") {
    // two independent uniform dims; a lexicographic layout on `a` holds
    // the full `b` range in every file, a z-ordered layout boxes both
    val n = 65536
    val rng = new scala.util.Random(7)
    val df = (1 to n).map(_ => (rng.nextInt(256).toLong, rng.nextInt(256).toLong))
      .toDF("a", "b")
    val base = Files.createTempDirectory("graft-zorder-spec").toString
    Layout.writeZOrdered(df, s"$base/z", Seq("a", "b"),
      Seq((0d, 255d), (0d, 255d)), numFiles = 16, bits = 8)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$base/linear")

    val pred = col("b").between(100, 115) // 1/16 of rows, second dim only
    val zRows = scanRows(spark.read.parquet(s"$base/z").filter(pred))
    val linRows = scanRows(spark.read.parquet(s"$base/linear").filter(pred))
    // linear: every file's b-range spans [0,255] -> no skipping, all n
    // rows leave the reader; z-ordered: only files whose b-box overlaps
    // [100,115] emit. Assert the contrast with a 2x margin (expected ~4x)
    assert(linRows >= n * 9L / 10,
      s"linear layout unexpectedly skipped: $linRows of $n")
    assert(zRows * 2 <= linRows,
      s"z-order skipped nothing: z=$zRows vs linear=$linRows")
    info(s"scan rows under the b-only predicate: z-ordered=$zRows, " +
      s"linear=$linRows of $n (${linRows / math.max(zRows, 1)}x skipped)")

    // and the layout is invisible to results
    val zAgg = spark.read.parquet(s"$base/z").filter(pred)
      .agg(count(lit(1)), sum("a")).collect().toSeq
    val flatAgg = df.filter(pred).agg(count(lit(1)), sum("a")).collect().toSeq
    assert(zAgg == flatAgg)
  }

  test("compactStore: in-place partition-dir compaction preserves the row " +
       "multiset, keeps the pruning layout, and skips tidy partitions") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-compactstore").toString
    // an append-per-batch store: 3 batches shatter each partition dir
    // into 3 files (repartition on the partition column → 1 per batch)
    val store = s"$base/store"
    (0 until 3).foreach { b =>
      (0 until 40).map(i => (b * 40L + i, (i % 4).toString))
        .toDF("id", "pk")
        .repartition(col("pk"))
        .write.partitionBy("pk").mode("append").parquet(store)
    }
    def partFiles(): Map[String, Set[String]] =
      new java.io.File(store).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("pk="))
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    val before = spark.read.parquet(store)
      .groupBy("id", "pk").count().collect().toSet
    val filesBefore = partFiles()
    assert(filesBefore.values.forall(_.size == 3), s"setup: $filesBefore")

    val (nDone, nBefore, nAfter) =
      Layout.compactStore(spark, store, 64L * 1024 * 1024, maxFiles = 1)
    assert(nDone == 4 && nBefore == 12 && nAfter == 4,
      s"expected 4 dirs 12→4 files, got ($nDone, $nBefore, $nAfter)")
    val filesAfter = partFiles()
    assert(filesAfter.keySet == filesBefore.keySet,
      "compaction must not change the partition-directory layout")
    assert(filesAfter.values.forall(_.size == 1))
    // bytes changed, rows did not — the full multiset survives,
    // partition column still derived from the directory names
    val after = spark.read.parquet(store)
      .groupBy("id", "pk").count().collect().toSet
    assert(after == before, "compaction altered the row multiset")
    // no stale swap-working dirs left behind (Hadoop's own dot-files,
    // e.g. ._SUCCESS.crc, are expected), and a second pass is a no-op
    assert(!new java.io.File(store).listFiles()
      .exists(f => f.getName.startsWith(".compact-") ||
        f.getName.startsWith(".old-")), "stale swap dirs left behind")
    val (n2, b2, a2) =
      Layout.compactStore(spark, store, 64L * 1024 * 1024, maxFiles = 1)
    assert(n2 == 0 && b2 == 4 && a2 == 4, s"re-run not a no-op: ($n2,$b2,$a2)")
  }

  test("compactStore keeps a pruned signature-store probe identical") {
    import graft.operators.TextOps
    val docs = (1L to 30L).map(i =>
        (i, if (i % 3 == 0) "a b c d e f g" else s"w$i x$i y$i z$i q$i"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sigstore-compact").toString
    val parts = 8
    // two appends shatter the store, as the incremental loop would
    val (h1, h2) = (docs.filter(col("doc_id") <= 15),
      docs.filter(col("doc_id") > 15))
    TextOps.writeSignatureStorePartitioned(
      TextOps.signatureStore(h1, "doc_id", "text"), tmp, parts)
    TextOps.writeSignatureStorePartitioned(
      TextOps.signatureStore(h2, "doc_id", "text"), tmp, parts,
      mode = "append")
    val probe = TextOps.signatureStore(docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text")
    val pre = TextOps.prunedSignatureStore(spark, tmp, parts, probe)
      .collect().map(_.toString).sorted
    Layout.compactStore(spark, tmp, 64L * 1024 * 1024, maxFiles = 1)
    val post = TextOps.prunedSignatureStore(spark, tmp, parts, probe)
      .collect().map(_.toString).sorted
    assert(post.sameElements(pre),
      "compaction changed what a pruned probe reads")
  }

  test("rewritePartitionsInPlace transforms only the named partitions, " +
       "skips absent names, and preserves the read layout") {
    val df = (1L to 40L).map(i => (i, i % 4)).toDF("id", "p")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-rewrite-inplace").toString
    df.write.mode("overwrite").partitionBy("p").parquet(tmp)
    def fileSet(name: String) =
      Option(new java.io.File(tmp, name).listFiles())
        .getOrElse(Array.empty)
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val untouchedBefore = fileSet("p=2")
    // rewrite p=0 and p=1 (drop even ids); p=9 does not exist → skipped
    val n = Layout.rewritePartitionsInPlace(spark, tmp, "p",
      Seq(0L, 1L, 9L))(part => part.filter(col("id") % 2 === 1))
    assert(n == 2, s"expected 2 rewrites, got $n")
    val back = spark.read.parquet(tmp)
    // p=0 holds ids ≡ 0 mod 4 — all even, so the partition empties;
    // p=1's ids are all odd — the filter keeps everything
    assert(back.filter(col("p") === 0).count() == 0)
    assert(back.filter(col("p") === 1).count() == 10)
    // unnamed partitions byte-identical, full layout still readable
    assert(fileSet("p=2") == untouchedBefore,
      "an unnamed partition's files changed")
    assert(back.filter(col("p") === 2).count() == 10)
    assert(back.filter(col("p") === 3).count() == 10)
    // the partition column still prunes (the dirs kept their names)
    val plan = back.filter(col("p") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
  }
}
