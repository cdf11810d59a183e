package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for corpus curation: the web-crawl side of a
 * training-data pipeline ranks domains/pages by link structure
 * (Common Crawl publishes exactly such host- and domain-level ranks)
 * and feeds the rank into quality gating.
 *
 * [[pageRank]] is a power iteration written as plain joins and
 * aggregations — the Pregel-lite shape relational engines execute well:
 * per iteration, each edge sends `rank(src)/outdeg(src)` to its
 * destination (a shuffle on `dst` with map-side combine), and every
 * node folds damping. Edges partition by key; a hot destination is a
 * groupBy hot key (AQE-splittable), never a cross product. The loop
 * `localCheckpoint`s each iteration so plans don't nest (the
 * [[Dedup]] connected-components recipe).
 *
 * DETERMINISM: ranks are FIXED-POINT longs in millionths (`SCALE`),
 * not doubles — floating summation order across partitions would make
 * every run (and every engine) disagree in late digits, while integer
 * sums are associative, so the result is bit-reproducible and the
 * DuckDB oracle (q_pagerank) replays it exactly with `//` division.
 * Contributions use floor division (`rank div outdeg`), so up to
 * `outdeg-1` millionths per node-iteration are truncated rather than
 * redistributed — a sub-ppm bias, irrelevant for ranking.
 *
 * Simple variant: dangling nodes (no out-edges) leak their mass
 * instead of redistributing it — ranks still order correctly; add a
 * dangling-sum broadcast term if the exact eigenvector matters.
 */
object Graph {
  /** Fixed-point scale: ranks are longs in millionths. */
  val Scale = 1000000L

  /** True when the node ids of the (lo, hi) edge relation provably pack
    * into one long as `a << 32 | b`: integral type, nonnegative, below
    * 2^31. One metadata-sized min/max job over the (checkpointed) edge
    * list — `lo <= hi` per row by construction, so min(lo)/max(hi)
    * bound every id. Used by the wedge-stream operators to halve their
    * pair-key width (guide §2.3 "narrower types"); results are
    * identical on either path, non-packable ids take the general one. */
  private def packableIds(e: DataFrame, lo: String, hi: String): Boolean = {
    val t = e.schema(lo).dataType
    Seq("integer", "long", "short", "byte").contains(t.typeName) && {
      val r = e.agg(min(col(lo)).cast("long"), max(col(hi)).cast("long")).head()
      !r.isNullAt(0) && r.getLong(0) >= 0L && r.getLong(1) < (1L << 31)
    }
  }

  /**
   * `iterations` rounds of damped power iteration over `edges`
   * (`srcCol`, `dstCol`; parallel edges count once — deduped).
   * `dampingPermille` is the damping factor in permille (850 = the
   * classic 0.85). Returns (node, rank) with rank in millionths of the
   * uniform start mass.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampingPermille: Int = 850): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    // outdeg is per-src CONSTANT across iterations, so it joins into the
    // edge table ONCE here instead of once per iteration (r19 opt round:
    // one groupBy + one join replaces `iterations` of each; the window
    // formulation would be one pass but windows don't partial-aggregate).
    val outdeg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(outdeg, "src").localCheckpoint(true)
    val base = (1000L - dampingPermille) * Scale
    var ranks = nodes.withColumn("rank", lit(Scale))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("in_mass"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${base}L + $dampingPermille * coalesce(in_mass, 0L)) div 1000")
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /**
   * Synchronous label propagation (Raghavan et al. 2007) — community
   * detection on the undirected graph, made DETERMINISTIC: every node
   * simultaneously adopts the most frequent label among its neighbors,
   * ties to the smallest label, isolated nodes keep their own; a FIXED
   * iteration count replaces the usual random sweep order, so the
   * result is reproducible and the DuckDB oracle can unroll the same
   * rounds. Complements [[pageRank]] (importance), [[hits]]
   * (hub/authority) and the connected-components keep-decisions
   * (q_dedup_pipeline): LPA splits dense regions a CC merge would glue
   * together.
   *
   * Per iteration: one equi-join of the (symmetrized, deduped) edge
   * list with the label table, a (node, label) count, and a
   * min-struct argmax — all map-side-combinable aggregations; each
   * round `localCheckpoint`s so plans don't nest. Hot nodes cost their
   * degree, never degree² (no wedge expansion anywhere).
   */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val e = dir.unionByName(dir.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("a").as("node")).distinct().localCheckpoint(true)
    var labels = nodes.withColumn("community", col("node"))
    for (_ <- 1 to iterations) {
      val votes = e
        .join(labels.select(col("node").as("b"), col("community").as("lbl")), "b")
        .groupBy(col("a").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      // `winner` covers EVERY node by construction — labels cover all
      // nodes (invariant: the initial labels ARE nodes, and this loop
      // preserves coverage), e is symmetric so set(a) = set(b) = nodes
      // and every node appears as `a` with >= 1 neighbor — so the old
      // `nodes.join(winner, left) + coalesce` re-spine was a provable
      // no-op costing one broadcast join per iteration (r19 opt round;
      // LlmPipelineSpec pins isolated/tie semantics unchanged).
      labels = votes.groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("w"))
        .select(col("node"), col("w.l").as("community"))
        .localCheckpoint(true)
    }
    labels
  }

  /**
   * Newman–Girvan modularity of a community assignment — the scalar
   * that says whether [[labelPropagation]]'s communities are REAL
   * structure or noise (Q ≈ 0): over the symmetrized edge set E₂
   * (each undirected edge twice, |E₂| = 2m),
   *
   *   Q = Σ_c ( intra₂_c/|E₂| − (d_c/|E₂|)² )
   *     = Σ_c ( |E₂|·intra₂_c − d_c² ) / |E₂|²
   *
   * with intra₂_c / d_c exact longs from TWO groupBys, the numerator
   * summed in DECIMAL(38,0) (d_c² overflows longs at ~3e9 same-
   * community endpoint rows), and ONE round-once double division at
   * the end — sign-safe (Q can be negative) and bit-replayable by a
   * HUGEINT oracle.
   *
   * Scale shape: two label equi-joins onto the edge list (shuffles on
   * the node key the labels already carry), one community groupBy
   * (map-side combined, |communities| rows out), a one-row broadcast
   * total. The edge list never shuffles twice.
   *
   * Returns one row: (n_communities, m_edges, q_ppm).
   */
  def modularity(labels: DataFrame, edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val e = dir.unionByName(dir.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b")).distinct()
    // Labels must cover EVERY edge endpoint: an inner join would
    // silently drop unlabeled edges from both |E₂| and the community
    // counts, skewing Q instead of failing. [[labelPropagation]] output
    // covers all nodes by construction; caller-supplied labels get the
    // same contract ENFORCED — left joins with a raise_error woven into
    // the label column itself (rides the join, no extra counting job,
    // survives column pruning because ca/cb are load-bearing).
    def need(c: String, ep: String): Column =
      when(col(c).isNotNull, col(c)).otherwise(raise_error(concat(
        lit(s"modularity: edge endpoint "), col(ep).cast("string"),
        lit(" has no community label — labels must cover every node " +
          "touched by an edge"))))
    val withL = e
      .join(labels.select(col("node").as("a"), col("community").as("ca")),
        Seq("a"), "left")
      .join(labels.select(col("node").as("b"), col("community").as("cb")),
        Seq("b"), "left")
      .select(col("a"), col("b"), need("ca", "a").as("ca"),
        need("cb", "b").as("cb"))
    // rows grouped by the SOURCE label: count = Σ_{i∈c} outdeg_i = d_c;
    // intra₂ counts both directions of every intra-community edge
    // perC has TWO consumers (the |E₂| rollup and the numerator scan);
    // without materialization each re-executes the withL label-join
    // subtree — the committed r19 after-plan carried the whole edge
    // derivation twice (16 parquet scans, no ReusedExchange). perC is
    // |communities| rows, so checkpointing it is metadata-sized while
    // the saved re-derivation is a full edge+2-label-join pass
    // (guide §1.2: don't compute things twice).
    val perC = withL.groupBy(col("ca"))
      .agg(count(when(col("ca") === col("cb"), 1)).as("__intra2"),
        count(lit(1)).as("__deg"))
      .localCheckpoint(true)
    // |E₂| = Σ_c d_c, so the total rolls up from the tiny per-community
    // table — the old separate `withL.agg(count(*))` re-executed the
    // whole label-join subtree a second time (r19 opt round)
    val m2t = perC.agg(sum("__deg").as("__m2"))
    val dec = "decimal(38,0)"
    perC.crossJoin(broadcast(m2t))
      .select(col("ca"),
        (col("__m2").cast(dec) * col("__intra2") -
          col("__deg").cast(dec) * col("__deg")).as("__num_c"),
        col("__m2"))
      .agg(count(lit(1)).as("n_communities"), max("__m2").as("__m2x"),
        sum("__num_c").as("__num"))
      .select(col("n_communities"),
        expr("__m2x div 2").as("m_edges"),
        round(lit(1e6) * col("__num").cast("double") /
          (col("__m2x").cast(dec) * col("__m2x")).cast("double"))
          .cast("long").as("q_ppm"))
  }

  /**
   * Triangle enumeration over an undirected graph — the clustering /
   * community-density primitive (local clustering coefficients, spam
   * farm detection in link graphs: organic neighborhoods close
   * triangles, link farms don't).
   *
   * NOT the naive three-way self-join on the raw edge list: that plan's
   * middle join fans every high-degree node's edge pairs into one
   * reducer (a celebrity node with d neighbors yields d² wedge rows).
   * This is the degree-ordered orientation algorithm (Schank-Wagner /
   * Cohen's MapReduce form): each undirected edge is oriented from its
   * (degree, id)-smaller endpoint to the larger, so every node's
   * out-degree is O(√m) and wedge generation — the only quadratic step
   * — is bounded by Σ outdeg² = O(m^1.5) TOTAL, independent of skew.
   * Both the wedge build and the closing check are plain equi-joins
   * (shuffle on node / edge key), so AQE sizes the reducers.
   *
   * Each triangle is found exactly once (at its unique
   * (degree, id)-minimal apex) and reported with its vertices sorted by
   * id: (a < b < c).
   *
   * Input: any (src, dst) relation; direction, parallel edges and
   * self-loops are ignored (canonicalized + distinct'd first).
   */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct().localCheckpoint(true)
    val deg = e.select(col("lo").as("node"))
      .unionByName(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orient each edge from the (deg, id)-smaller endpoint: u -> v.
    val oriented = e
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), "hi")
      .select(
        when(struct(col("dlo"), col("lo")) < struct(col("dhi"), col("hi")),
          struct(col("lo").as("u"), col("hi").as("v"),
            col("dhi").as("dv")))
          .otherwise(struct(col("hi").as("u"), col("lo").as("v"),
            col("dlo").as("dv")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
      .localCheckpoint(true)
    // Wedges at apex u: ordered out-neighbor pairs (v1, v2) with
    // (deg, id)(v1) < (deg, id)(v2) — matches the edge orientation, so
    // the closing edge (if any) is oriented v1 -> v2.
    val w1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val w2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
    // When node ids provably pack into one long (see [[packableIds]]),
    // the (v1, v2) closing key rides as a single long: the O(m^1.5)
    // wedge stream narrows from 3 words to 2 through its shuffle and
    // the closing join hashes/compares one long instead of a two-field
    // key (guide §2.3). Ids unpack — cast back to their original
    // type — only on the closed triangles, so results are identical;
    // non-packable ids take the unchanged general path.
    val idType = e.schema("lo").dataType
    val packed = packableIds(e, "lo", "hi")
    def pairKey(a: Column, b: Column): Column =
      shiftleft(a.cast("long"), 32).bitwiseOR(b.cast("long"))
    val wedges0 = w1.join(w2, Seq("u"))
      .where(struct(col("d1"), col("v1")) < struct(col("d2"), col("v2")))
    // SHUFFLE_HASH on the closing side: the wedge stream is O(m^1.5)
    // rows (20M at sf0.1) while closing is the m-row oriented edge
    // list — a sort-merge join would SORT the wedge stream per
    // partition for nothing; a shuffled-hash join builds the m/parts
    // hash table and streams the wedges (guide §3.1). Inner equi-join,
    // result rows identical. SCALE ASSUMPTION (r19 advice): the SHJ
    // build map does not spill, so the per-partition build side must
    // fit in memory — it is the ORIENTED edge list hashed on (v1, v2),
    // i.e. near-uniform m/partitions rows regardless of node skew
    // (orientation bounds out-degree at O(√m)); size shuffle
    // partitions to the edge count if the library runs beyond the
    // bench SFs.
    val closed = if (packed) {
      val wedges = wedges0.select(col("u"),
        pairKey(col("v1"), col("v2")).as("__p"))
      val closing = oriented.select(pairKey(col("u"), col("v")).as("__p"))
      wedges.join(closing.hint("shuffle_hash"), Seq("__p"))
        .select(col("u"), shiftright(col("__p"), 32).cast(idType).as("v1"),
          col("__p").bitwiseAND(lit(0xffffffffL)).cast(idType).as("v2"))
    } else {
      val wedges = wedges0.select(col("u"), col("v1"), col("v2"))
      val closing = oriented.select(col("v").as("v2"), col("u").as("v1"))
      wedges.join(closing.hint("shuffle_hash"), Seq("v1", "v2"))
        .select(col("u"), col("v1"), col("v2"))
    }
    closed
      .select(array_sort(array(col("u"), col("v1"), col("v2"))).as("t"))
      .select(col("t").getItem(0).as("a"), col("t").getItem(1).as("b"),
        col("t").getItem(2).as("c"))
  }

  /**
   * HITS (Kleinberg hubs-and-authorities) over a DIRECTED graph — the
   * complement of [[pageRank]] for bipartite-flavored link data:
   * authorities are pages good links point AT, hubs are pages that
   * point at good authorities (catalog pages vs content pages in a
   * crawl; customers vs suppliers in a transaction graph).
   *
   * Same Pregel-lite relational shape as pageRank: per iteration,
   * authority(v) = Σ hub(u) over in-edges (one shuffle on dst with
   * map-side combine), then hub(u) = Σ auth(v) over out-edges (one
   * shuffle on src), each followed by max-normalization — the score
   * vector rescales so max = [[Scale]], keeping every value an exact
   * long (L2 normalization would reintroduce float drift; max-norm is
   * the standard integer-safe alternative and preserves ranking). The
   * max is a one-row broadcast; `localCheckpoint` per iteration stops
   * plan nesting.
   *
   * DETERMINISM: all arithmetic is long sums + floor division, so the
   * result is bit-reproducible and replayable in any engine (the
   * q_hits oracle unrolls the iterations in SQL). Nodes with no
   * in-edges score authority 0; no out-edges, hub 0.
   *
   * Returns (node, hub, auth) in [[Scale]]-millionths, every node from
   * either edge endpoint present.
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    // raw is consumed twice (the one-row max aggregate and the crossJoin
    // probe side) but NOT materialized: the r20 A/B measured an eager
    // checkpoint here at +0.4 s on q_hits — the subtree ends in the
    // groupBy exchange, which AQE's runtime stage reuse already shares
    // between the two consumers, so the checkpoint only added jobs.
    def normalized(raw: DataFrame, c: String): DataFrame = {
      val mx = raw.agg(max(col(c)).as("__graft_mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"$c * ${Scale}L div greatest(__graft_mx, 1L)").as(c))
    }
    // The zero-fill spine (nodes LEFT JOIN sums + coalesce 0) is applied
    // ONCE at the end, not per iteration (r20; the r19 verdict's "fewer
    // per-iteration jobs" item). Inside the loop it was provably dead
    // weight: the hub step reads auth only through an INNER join on dst
    // — and every dst has an in-edge, so the groupBy output covers it
    // (a zero-auth node contributes sum 0 exactly like an absent row) —
    // and symmetrically the auth step reads hub only through src. The
    // normalization max is also unchanged: sums are nonnegative, so
    // zero-padding never moves a max that has any positive entry, and
    // the all-zero corner normalizes to all-zero on both shapes (the
    // greatest(mx, 1) guard). Removes two node-spine joins and the
    // hub⋈auth zip per iteration at any scale; only the final scores
    // table re-attaches the no-in-edge / no-out-edge nodes with 0.
    var hub = nodes.withColumn("hub", lit(Scale))
    var auth = nodes.withColumn("auth", lit(Scale))
    for (_ <- 1 to iterations) {
      val aAgg = e.join(hub.select(col("node").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("node")).agg(sum("hub").as("auth"))
      auth = normalized(aAgg, "auth").localCheckpoint(true)
      val hAgg = e.join(auth.select(col("node").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("node")).agg(sum("auth").as("hub"))
      hub = normalized(hAgg, "hub").localCheckpoint(true)
    }
    nodes.join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /**
   * k-core pruning — the link-graph quality gate (a page in the k-core
   * has k neighbors that each have k neighbors…; link-farm tendrils and
   * orphan chains fall out after a round or two). `rounds` FIXED
   * iterations of "drop nodes with degree < k, recompute" — fixed, not
   * to-convergence, so the result is deterministic for the oracle and
   * the cost is bounded a priori (full coreness would loop O(degeneracy)
   * times; real curation gates run 2-4 rounds).
   *
   * Scale shape per round: one degree groupBy (map-side combinable) and
   * two equi-joins of the edge list against the surviving-node table —
   * never a self-join of edges; `localCheckpoint` cuts the growing plan
   * lineage each round exactly like [[labelPropagation]]. Output:
   * surviving nodes with their residual degree after the last prune.
   *
   * Input: any (src, dst) relation; direction, parallel edges and
   * self-loops are ignored (canonicalized + distinct'd first).
   */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct().localCheckpoint(true)
    def degrees(cur: DataFrame): DataFrame =
      cur.select(col("lo").as("node"))
        .unionByName(cur.select(col("hi").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("degree") >= k).select("node")
      e = e
        .join(keep.select(col("node").as("lo")), "lo")
        .join(keep.select(col("node").as("hi")), "hi")
        .select("lo", "hi")
        .localCheckpoint(true)
    }
    degrees(e)
  }

  /**
   * Adamic–Adar link prediction over an undirected graph: for every
   * non-adjacent node pair (u, v) with at least one common neighbor,
   * `common` = |N(u) ∩ N(v)| and `aa_unats = Σ_w round(1e6 / ln(deg w))`
   * over the common neighbors w — the classic "which edge forms next"
   * score (friend suggestion; related-entity candidates for
   * retrieval-corpus linking). Each 1/ln term is rounded to integer
   * micro-units BEFORE the sum (the psiReport micro-nat discipline), so
   * any IEEE engine reproduces the long exactly; a common neighbor has
   * deg ≥ 2 by construction, so ln > 0 always.
   *
   * Scale shape: wedges enumerate through the CENTER node w — one
   * equi-self-join of the adjacency on w, quadratic only in deg(w) —
   * with centers capped at `maxDegree` first (the hub guard: a
   * celebrity hub would cost deg² for terms worth ~1/ln(deg) ≈ 0 each;
   * the cap is part of the operator's documented semantics, replayed
   * by the oracle). Existing edges leave via one LEFT ANTI join.
   * Output: (u, v, common, aa_unats), u < v.
   */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Int = 64, minCommon: Long = 1L): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct().localCheckpoint(true)
    val adj = e.select(col("lo").as("w"), col("hi").as("nb"))
      .unionByName(e.select(col("hi").as("w"), col("lo").as("nb")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("deg"))
    // deg >= 2: a degree-1 center cannot form a wedge (its self-join
    // yields only the u = v row the u < v filter drops), so excluding it
    // up front shrinks the pair join AND keeps ln(deg) > 0 — the old
    // per-wedge term never saw deg 1, and under ANSI 1e6/ln(1) errors
    val centers = adj.join(
      deg.where(col("deg") <= maxDegree && col("deg") >= 2L), "w")
    // the 1/ln(deg) micro term depends only on the CENTER w, so it is
    // computed once per center-adjacency row here (|adj| rows) instead
    // of once per wedge (Σ deg² rows — 20M at sf0.1, where the r19
    // probe measured the per-wedge log/round as a visible slice of the
    // wedge stage); the wedge rows stay three longs wide either way
    val term = round(lit(1e6) / log(col("deg").cast("double"))).cast("long")
      .as("__term")
    // The wedge aggregate is the heaviest stage of this operator: ~15M
    // (u, v) groups from 20M wedge rows at sf0.1, inherent to exact
    // common-neighbor counting. When the node ids are provably
    // packable — integral, nonnegative, below 2^31 (one metadata-sized
    // min/max job over the checkpointed edge list; the sorted pair has
    // lo <= hi per row, so min(lo)/max(hi) bound every id) — the pair
    // key packs into ONE long `u<<32 | v`: the partial-aggregate rows
    // narrow from 4 words to 3, and the 15M-group hash aggregate hashes
    // and compares a single long instead of a two-field row (guide §2.3
    // "narrower types"; r19 verdict "Next round" item 1). Ids are
    // unpacked — cast back to their original type — only after the
    // minCommon filter (33k rows at sf0.1), so results and schema are
    // bit-identical; non-packable ids take the unchanged general path.
    val idType = e.schema("lo").dataType
    val scored = if (packableIds(e, "lo", "hi")) {
      val a = centers.select(col("w"), col("nb").cast("long").as("u"), term)
      val b = centers.select(col("w"), col("nb").cast("long").as("v"))
      a.join(b, Seq("w")).where(col("u") < col("v"))
        .select(shiftleft(col("u"), 32).bitwiseOR(col("v")).as("__uv"),
          col("__term"))
        .groupBy("__uv")
        .agg(count(lit(1)).as("common"), sum(col("__term")).as("aa_unats"))
        .where(col("common") >= minCommon)
        .select(shiftright(col("__uv"), 32).cast(idType).as("u"),
          col("__uv").bitwiseAND(lit(0xffffffffL)).cast(idType).as("v"),
          col("common"), col("aa_unats"))
    } else {
      val a = centers.select(col("w"), col("nb").as("u"), term)
      val b = centers.select(col("w"), col("nb").as("v"))
      a.join(b, Seq("w")).where(col("u") < col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("common"), sum(col("__term")).as("aa_unats"))
        .where(col("common") >= minCommon)
    }
    scored.join(e, scored("u") === e("lo") && scored("v") === e("hi"),
      "left_anti")
  }

  /**
   * Co-membership ("users who engaged X also engaged Y"): item pairs
   * weighted by the number of distinct users engaging both — the
   * bipartite-projection statistic behind related-items panels and
   * behavioral clustering. Input is raw (user, item) interaction rows;
   * repeats collapse first, so a user contributes each pair once.
   *
   * Scale shape: distinct (user, item) is one groupBy; users above
   * `maxItems` distinct items are DROPPED before pairing (the hub
   * guard — a bot touching every item would alone contribute |items|²
   * pairs; the cap is documented operator semantics, replayed by the
   * oracle), then the pair self-join on the user is bounded by
   * maxItems² per user and ONE (a, b) count groupBy aggregates it.
   * Output: (a, b, n_users), a < b, pruned at `minUsers`.
   */
  def coMembership(df: DataFrame, userCol: String, itemCol: String,
      maxItems: Int = 50, minUsers: Long = 2L): DataFrame = {
    require(maxItems >= 2, s"maxItems must be >= 2, got $maxItems")
    val ui = df.select(col(userCol).as("u"), col(itemCol).as("i"))
      .where(col("u").isNotNull && col("i").isNotNull)
      .distinct()
    val keep = ui.groupBy("u").agg(count(lit(1)).as("__d"))
      .where(col("__d") <= maxItems).select("u")
    val kept = ui.join(keep, "u")
    kept.select(col("u"), col("i").as("a"))
      .join(kept.select(col("u"), col("i").as("b")), Seq("u"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_users"))
      .where(col("n_users") >= minUsers)
  }
}
