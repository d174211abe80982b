package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  /** Independent re-derivation of the fixed-point recurrence on adjacency
    * maps — no Spark, no SQL; the spec's ground truth. */
  private def refRanks(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> PageRank.ScaleUnit).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / out(u) }.sum).toMap
      pr = nodes.map(n => n -> (150000L + 850L * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    pr
  }

  test("pageRankOn: matches the independent map-based recurrence on a toy graph") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    // cycle 1→2→3→1, plus 4→2 (extra in-link for 2), 5 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L))
    val got = PageRank.pageRankOn(
      nodes.toDF("node"), edges.toDF("src", "dst"), PageRank.Iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refRanks(nodes, edges, PageRank.Iterations)
    assert(got == want, s"got $got want $want")
    // structural sanity the numbers should encode: every cycle node
    // accumulates mass above the isolated node, which sits at the base
    assert(got(5L) == 150000L)
    assert(Seq(1L, 2L, 3L).forall(n => got(n) > got(5L)))
    // 4 only emits (no in-links): decays to the base like the isolated node
    assert(got(4L) == 150000L)
  }

  /** Seed-restart twin of [[refRanks]] — the PPR ground truth. */
  private def refPpr(nodes: Seq[Long], seeds: Set[Long],
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(n => n -> (if (seeds(n)) PageRank.ScaleUnit else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / out(u) }.sum).toMap
      pr = nodes.map(n => n ->
        ((if (seeds(n)) 150000L else 0L) + 850L * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    pr
  }

  test("personalizedPageRankOn: matches the map recurrence; unreachable nodes at exactly 0") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val seeds = Set(1L)
    // seed 1 feeds the 1→2→3→1 cycle; 4→2 injects nothing (4 has no mass);
    // 5 is unreachable from the seed
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L))
    val got = PageRank.personalizedPageRankOn(
      nodes.map(n => (n, seeds(n))).toDF("node", "is_seed"),
      edges.toDF("src", "dst"), PageRank.Iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPpr(nodes, seeds, edges, PageRank.Iterations)
    assert(got == want, s"got $got want $want")
    // the property the GLOBAL recurrence cannot express: nodes the seed
    // set cannot reach score exactly zero
    assert(got(4L) == 0L && got(5L) == 0L)
    // the seed keeps its restart floor; its cycle successors hold mass
    assert(got(1L) >= 150000L)
    assert(got(2L) > 0L && got(3L) > 0L)
  }

  test("docPersonalizedPageRank: deterministic; seeds floored at restart mass; seeds outrank on average") {
    val p1 = PageRank.docPersonalizedPageRank(spark, dir).collect()
    val p2 = PageRank.docPersonalizedPageRank(spark, dir).collect()
    assert(p1.map(_.toString).toSeq == p2.map(_.toString).toSeq)
    val src = Tables(spark, dir, "documents").select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (seedRows, restRows) = p1.partition(r => src(r.getLong(0)) == PageRank.PprSeedSource)
    assert(seedRows.nonEmpty && seedRows.forall(_.getLong(1) >= 150000L),
      "a seed scored below its restart floor")
    // proximity semantics: the trusted slice's mean dominates the rest's
    val seedMean = seedRows.map(_.getLong(1)).sum.toDouble / seedRows.length
    val restMean = restRows.map(_.getLong(1)).sum.toDouble / restRows.length
    assert(seedMean > restMean, s"seed mean $seedMean <= rest mean $restMean")
  }

  /** Independent HITS re-derivation on adjacency maps, mirroring the
    * integer max-normalized recurrence. */
  private def refHits(nodes: Seq[Long], directed: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val u = PageRank.ScaleUnit
    var h = nodes.map(_ -> u).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val ar = nodes.map(n => n -> directed.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      val am = math.max(ar.values.max, 1L)
      a = ar.view.mapValues(v => v * u / am).toMap
      val hr = nodes.map(n => n -> directed.filter(_._1 == n).map(e => a(e._2)).sum).toMap
      val hm = math.max(hr.values.max, 1L)
      h = hr.view.mapValues(v => v * u / hm).toMap
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  test("hitsOn: matches the map recurrence; star graph separates pure hubs from the authority") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    // star: 3,4,5 all point at 1 (newer copies of one original); chain
    // 5→2 gives 5 a second authority; 6 is isolated
    val directed = Seq((3L, 1L), (4L, 1L), (5L, 1L), (5L, 2L))
    val got = PageRank.hitsOn(nodes.toDF("node"), directed.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = refHits(nodes, directed, PageRank.Iterations)
    assert(got == want, s"got $got want $want")
    // 1 is the top authority (pointed at by every hub) and a pure sink
    assert(got(1L)._2 == PageRank.ScaleUnit && got(1L)._1 == 0L)
    // 5 points at BOTH authorities — the top hub; 3/4 are lesser hubs
    assert(got(5L)._1 == PageRank.ScaleUnit)
    assert(got(3L)._1 < got(5L)._1 && got(4L)._1 < got(5L)._1)
    // the isolated node carries neither signal
    assert(got(6L) == ((0L, 0L)))
  }

  test("docHits: deterministic; scores bounded by the unit; both signals present") {
    val h1 = PageRank.docHits(spark, dir).collect()
    val h2 = PageRank.docHits(spark, dir).collect()
    assert(h1.map(_.toString).toSeq == h2.map(_.toString).toSeq)
    assert(h1.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= PageRank.ScaleUnit))
    assert(h1.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= PageRank.ScaleUnit))
    // the directed view must produce genuinely two-sided signal: the top
    // hub and the top authority are different documents
    val topHub = h1.maxBy(_.getLong(1)).getLong(0)
    val topAuth = h1.maxBy(_.getLong(2)).getLong(0)
    assert(topHub != topAuth, s"hub/auth collapsed onto doc $topHub")
  }

  test("linkGraph: edges symmetric, loop-free, and bounded by rare-shingle fan-out") {
    val docs = Tables(spark, dir, "documents")
    val edges = PageRank.linkGraph(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "no link edges at this SF")
    val set = edges.toSet
    assert(edges.forall { case (s, d) => s != d }, "self-loop present")
    assert(set.forall { case (s, d) => set.contains((d, s)) }, "asymmetric edge")
    // df cap ⇒ a single shingle creates at most maxDf·(maxDf−1) edges; the
    // graph must be far below the all-pairs count
    val n = docs.count()
    assert(edges.length < n * n / 2, "edge count approaches all-pairs")
  }

  test("triangleCounts: toy graph matches hand enumeration; orientation is count-neutral") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus pendant 5–1
    val und = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val edges = (und ++ Seq((1L, 5L), (5L, 1L))).toDF("src", "dst")
    val got = PageRank.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $got")
  }

  test("docTriangles: corners consistent — total count divisible by 3, all positive") {
    val out = PageRank.docTriangles(spark, dir).collect()
    assert(out.nonEmpty, "no triangles at this SF")
    assert(out.forall(_.getLong(1) > 0))
    assert(out.map(_.getLong(1)).sum % 3 == 0, "corner sum not divisible by 3")
  }

  test("docComponents: partition covers every doc; linked docs share a component; sizes add up") {
    val out = PageRank.docComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables(spark, dir, "documents").count()
    assert(out.length.toLong == docs, "not a partition of the doc set")
    val comp = out.map(t => t._1 -> t._2).toMap
    for ((s, d) <- PageRank.linkGraph(Tables(spark, dir, "documents"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).take(500))
      assert(comp(s) == comp(d), s"linked ($s, $d) in different components")
    // component id = min member; size consistent with the partition
    val byComp = out.groupBy(_._2)
    for ((cid, members) <- byComp) {
      assert(members.map(_._1).min == cid, s"component $cid id not min member")
      assert(members.forall(_._3 == members.length.toLong), s"size wrong in $cid")
    }
  }

  test("docPageRank: deterministic, base-floored, and in-link mass raises rank") {
    val a = PageRank.docPageRank(spark, dir).collect()
    val b = PageRank.docPageRank(spark, dir).collect()
    assert(a.sameElements(b), "two runs disagree")
    assert(a.forall(_.getLong(1) >= 150000L), "rank below the damping base")
    assert(a.exists(_.getLong(1) > PageRank.ScaleUnit),
      "no node accumulated rank above the initial mass — graph degenerate?")
  }

  test("docBfsLevels: frontier expansion equals a brute in-memory BFS") {
    val out = PageRank.docBfsLevels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    val docs = Tables(spark, dir, "documents")
    val edges = PageRank.linkGraph(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = docs.filter(col("source") === PageRank.BfsSeedSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (k <- 1 to PageRank.BfsMaxHops) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist = dist ++ frontier.map(_ -> k)
    }
    assert(out == dist, "level-synchronous result must equal brute BFS")
    // the audit is live: a real level structure exists (the synthetic
    // corpus's rare-shingle graph is dense — everything is reached by
    // hop 2 — so the FINDING here is the distance histogram, not the
    // unreached set)
    assert(out.values.toSet.size >= 3, s"degenerate levels: ${out.values.toSet}")
  }

  /** Independent LPA re-derivation on adjacency maps — synchronous rounds,
    * (count DESC, label ASC) argmax, isolated nodes keep their own id. */
  private def refLpa(nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = nodes.map { n =>
        val votes = adj.getOrElse(n, Seq.empty).map(lbl).groupBy(identity)
          .view.mapValues(_.size).toSeq
        n -> (if (votes.isEmpty) lbl(n)
              else votes.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    lbl
  }

  test("lpaOn: two cliques with a weak bridge resolve to two communities; matches the map recompute") {
    import spark.implicits._
    // cliques {1,2,3,4} and {10,11,12,13}, one bridge 4–10, 20 isolated
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(10L, 11L, 12L, 13L)
    val und = (for (c <- Seq(cliqueA, cliqueB); a <- c; b <- c if a < b)
      yield (a, b)) :+ ((4L, 10L))
    val edges = und ++ und.map(_.swap)
    val nodes = (cliqueA ++ cliqueB) :+ 20L
    val got = PageRank.lpaOn(nodes.toDF("node"), edges.toDF("src", "dst"))
      .select("node", "lbl", "community_size").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = refLpa(nodes, edges, PageRank.LpaRounds)
    assert(got.view.mapValues(_._1).toMap == want,
      s"LPA labels diverged from the independent recompute: $got vs $want")
    // the two cliques hold distinct labels; the isolated node is a singleton
    assert(cliqueA.map(want).toSet.size == 1 && cliqueB.map(want).toSet.size == 1,
      "each clique must agree on one label internally")
    assert(want(1L) != want(10L), "the weak bridge must not merge the cliques")
    assert(got(20L) == ((20L, 1L)), "isolated node must be its own singleton")
  }

  test("docCommunities: deterministic; every community sits inside one connected component") {
    val c1 = PageRank.docCommunities(spark, dir).collect()
    val c2 = PageRank.docCommunities(spark, dir).collect()
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq, "LPA not deterministic")
    val comm = c1.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comp = PageRank.docComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // labels travel only along edges, so one community never spans two
    // components — and communities REFINE components (same-or-finer)
    for ((ms) <- comm.groupBy(_._2).values)
      assert(ms.keys.map(comp).toSet.size == 1,
        s"community ${ms.head._2} spans multiple components")
    // sizes are consistent with the labeling
    val sizes = c1.map(r => r.getLong(1) -> r.getLong(2)).toMap
    for ((l, ms) <- comm.groupBy(_._2))
      assert(sizes(l) == ms.size, s"community_size mismatch for label $l")
  }

  test("communityModularity: rows recompute from labels+edges; Q positive on real structure") {
    val out = PageRank.communityModularity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val docs = Tables(spark, dir, "documents")
    val edges = PageRank.linkGraph(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = PageRank.docCommunities(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = math.max(edges.length, 1)
    // independent per-community recompute
    val byC = labels.groupBy(_._2)
    for ((c, nNodes, inE, degS, contrib) <- out) {
      val members = byC(c).keySet
      assert(nNodes == members.size)
      assert(inE == edges.count { case (s, d) => members(s) && members(d) }.toLong)
      assert(degS == edges.count { case (s, _) => members(s) }.toLong)
      val want = BigDecimal(inE.toDouble / m - math.pow(degS.toDouble / m, 2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(contrib - want) <= 1e-6, s"community $c: $contrib vs $want")
    }
    // the dense rare-shingle graph has NO modular structure — LPA honestly
    // collapses it, and the metric reads ≈ 0: that VERDICT is the finding
    // (a fabricated Q here would mean the metric lies)
    val q = out.map(_._5).sum
    assert(math.abs(q) < 0.05, s"unexpected modularity on the dense corpus graph: $q")
    assert(q <= 1.0 + 1e-9)
  }

  test("modularityOf: hand-derived Q on the planted two-clique partition") {
    import spark.implicits._
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(10L, 11L, 12L, 13L)
    val und = (for (c <- Seq(cliqueA, cliqueB); a <- c; b <- c if a < b)
      yield (a, b)) :+ ((4L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = (cliqueA.map(_ -> 1L) ++ cliqueB.map(_ -> 10L))
      .toDF("node", "lbl")
    val out = PageRank.modularityOf(labels, edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // M = 26 directed edges; per clique: in = 12, degree_sum = 13
    // contribution = 12/26 − (13/26)² = 0.461538 − 0.25 = 0.211538
    val want = BigDecimal(12.0 / 26 - math.pow(13.0 / 26, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 10L))
    for ((c, contrib) <- out)
      assert(math.abs(contrib - want) <= 1e-9, s"clique $c: $contrib vs $want")
    val q = out.values.sum
    assert(q > 0.4, s"two-clique partition must be strongly modular: $q")
  }

  test("hierarchyPaths: pointer jumping equals a sequential parent walk") {
    val out = PageRank.hierarchyPaths(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val ids = Tables(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val f = PageRank.HierarchyFanout
    val brute = ids.sorted.map { id =>
      var chain = List(id)
      while (chain.head >= f) chain = (chain.head / f) :: chain
      (id, chain.head, (chain.length - 1).toLong, chain.mkString("/"))
    }
    assert(out.length == ids.length, "one row per node")
    assert(out.toSeq == brute.toSeq,
      "log-round doubling must equal the one-step parent walk")
    // the planted forest must actually be deep enough to exercise >1 jump
    assert(out.map(_._3).max >= 3, "forest too shallow to test doubling")
  }

  test("corenessOn: planted core vs periphery, with a cascading peel") {
    import spark.implicits._
    // a 6-clique (every member degree 5 → coreness 5, the cap), a pendant
    // CHAIN off one clique member (each chain node must cascade away one
    // round after its outer neighbor — the iterative part a single
    // degree filter would get wrong), and a disjoint 4-cycle (2-regular →
    // coreness exactly 2)
    val clique = for (a <- 1L to 6L; b <- 1L to 6L if a != b) yield (a, b)
    val chain = Seq((6L, 20L), (20L, 21L), (21L, 22L), (22L, 23L))
    val cycle = Seq((30L, 31L), (31L, 32L), (32L, 33L), (33L, 30L))
    val und = chain ++ cycle
    val edges = (clique ++ und ++ und.map(_.swap)).toDF("src", "dst")
    val got = PageRank.corenessOn(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (v <- 1L to 6L) assert(got(v) == 5L, s"clique node $v: ${got(v)}")
    for (v <- Seq(20L, 21L, 22L, 23L)) assert(got(v) == 1L, s"chain node $v: ${got(v)}")
    for (v <- Seq(30L, 31L, 32L, 33L)) assert(got(v) == 2L, s"cycle node $v: ${got(v)}")
    // the chain forces ≥2 genuine peel rounds at k=2 (node 23 falls first,
    // exposing 22, and so on) — assert the fixture really cascades by
    // checking a one-round peel would NOT have converged: after one k=2
    // round node 22 still has degree 2 via 21 and 23? No — 23 (degree 1)
    // falls round 1, 22 falls round 2. A node surviving round 1 but not
    // the fixed point is the cascade witness:
    val survivors1 = edges.groupBy("src").count().filter($"count" >= 2)
      .select($"src").as[Long].collect().toSet
    assert(survivors1.contains(22L) && got(22L) < 2L,
      "fixture no longer exercises the cascade (22 should survive round 1, fall later)")
  }

  test("sccOn: planted cycles, bridges, and singletons") {
    import spark.implicits._
    // two directed cycles joined by one-way bridges, plus a pure
    // feed-forward tail: SCCs must be exactly the cycles; bridge/tail
    // nodes are singletons even though they are reachable both ways in
    // the UNDIRECTED sense
    val c1 = Seq((1L, 2L), (2L, 3L), (3L, 1L))           // scc {1,2,3}
    val c2 = Seq((10L, 11L), (11L, 10L))                  // scc {10,11}
    val bridges = Seq((3L, 10L), (11L, 20L), (20L, 21L))  // one-way
    val edges = (c1 ++ c2 ++ bridges).toDF("src", "dst")
    val got = PageRank.sccOn(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNode = got.map(t => t._1 -> (t._2, t._3)).toMap
    for (v <- Seq(1L, 2L, 3L)) assert(byNode(v) == ((1L, 3L)), s"$v: ${byNode(v)}")
    for (v <- Seq(10L, 11L)) assert(byNode(v) == ((10L, 2L)), s"$v: ${byNode(v)}")
    for (v <- Seq(20L, 21L)) assert(byNode(v) == ((v, 1L)), s"$v: ${byNode(v)}")
    assert(got.length == 7, "one row per node appearing in the edge set")
  }
}
