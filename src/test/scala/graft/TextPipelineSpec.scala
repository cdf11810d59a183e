package graft

import graft.pipeline.{EmbeddingDedup, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("language_id identifies clear-cut samples across the profile set") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with his food"),
      ("es", "el perro corre por la calle y se esconde en un rincón del parque"),
      ("de", "der hund läuft nicht auf die straße und ist mit dem ball zufrieden"),
      ("fr", "le chien court dans la rue et les enfants sont pour une pause"),
      ("it", "il gatto dorme per non sentire la pioggia che cade nel giardino"),
      ("pt", "o gato dorme em um canto da casa para não ouvir o barulho"),
      ("nl", "de kat slaapt op het kussen en is niet bang voor een hond"),
      ("ru", "и он не знал что это было на самом деле но как всегда"),
      ("zh", "我 在 这 中 看 到 了 他 的 大 国"),
      ("und", "zxqv wvut kjhr pqmn"))
    val out = samples.toDF("expected", "text")
      .select($"expected", TextFunctions.language_id($"text").as("guess"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val wrong = out.filter { case (e, g) => e != g }
    assert(wrong.isEmpty, s"misidentified: ${wrong.mkString(", ")}")
  }

  test("language_id per-language accuracy floors across all 10 profiles") {
    // 10 varied samples per profile language (labeled mini-corpus; the
    // sf* documents corpus is all-English-vocab, so per-language floors
    // must come from here). Floor = 0.8 per language.
    val corpus: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq(
        "the house was quiet and they sat with a book on the table",
        "it is a long way to the station and he was late",
        "she went to the market for bread and milk in the morning",
        "the weather was cold as the wind came in from the north",
        "they spoke of the war and of the years that followed it",
        "he put his coat on the chair and looked at the fire",
        "the children played in the garden with a ball and a rope",
        "that was the best meal they had in a long while",
        "the road runs along the river and into the old town",
        "it was clear that the plan would fail without his help"),
      "es" -> Seq(
        "el niño juega en el parque con una pelota y su perro",
        "los libros de la biblioteca son para los estudiantes del pueblo",
        "la casa que compramos tiene un jardín con flores por todas partes",
        "se fue por la mañana con su madre y volvió por la noche",
        "una de las ventanas del salón estaba rota por el viento",
        "el agua del río baja con fuerza en la primavera",
        "los padres de su amigo viven en una ciudad del sur",
        "que las cosas cambien depende de lo que hagamos por ellas",
        "su hermana trabaja para una empresa del centro de la ciudad",
        "en el mercado se venden frutas y verduras de la región"),
      "de" -> Seq(
        "der hund läuft über die straße und das auto hält nicht an",
        "ich habe das buch nicht gelesen weil es zu lang ist",
        "die kinder spielen mit dem ball auf der wiese im park",
        "sie ist für die arbeit in eine andere stadt gezogen",
        "das wetter war schlecht und wir sind zu hause geblieben",
        "ein mann stand auf und ging ohne ein wort zu sagen",
        "die frau kaufte brot und milch für das frühstück ein",
        "es ist nicht leicht eine wohnung in der stadt zu finden",
        "der zug kommt um acht uhr auf dem bahnhof an",
        "ich bin mit den ergebnissen der prüfung sehr zufrieden"),
      "fr" -> Seq(
        "le chat dort dans la cuisine et les enfants jouent au salon",
        "il est parti pour une semaine au bord de la mer",
        "les rues du centre sont pleines de monde pour la fête",
        "une histoire qui ne finit pas comme les autres du pays",
        "le train du matin est toujours en retard pour le travail",
        "des fleurs poussent dans le jardin près du vieux mur",
        "qui veut venir avec nous au marché des livres anciens",
        "la maison est au bout du chemin dans les arbres",
        "une pluie fine tombe sur les toits de la ville est",
        "il ne faut pas oublier les clés dans la voiture"),
      "it" -> Seq(
        "il cane corre nel parco e non torna quando lo chiamo",
        "sono andato al mare con gli amici per il fine settimana",
        "la casa dei nonni è grande come un piccolo albergo",
        "che cosa vuoi fare domani se non devi lavorare anche tu",
        "anche i vicini sono venuti alla festa del paese",
        "il treno per roma parte dal primo binario della stazione",
        "non mi piace il caffè che fanno in quel bar",
        "gli studenti del corso sono bravi e studiano anche di sera",
        "nel giardino ci sono fiori di tutti i colori che vuoi",
        "si mangia bene in quella trattoria del centro come sempre"),
      "pt" -> Seq(
        "o menino brinca no quintal com o cachorro da vizinha",
        "não vou ao trabalho hoje porque estou em casa com febre",
        "a cidade tem um parque grande para as crianças do bairro",
        "os livros estão em uma caixa no canto da sala",
        "ela saiu de casa cedo para não perder o ônibus",
        "um amigo do meu pai mora em uma fazenda no interior",
        "o rio passa pela cidade e deságua no mar do norte",
        "se você quiser podemos ir ao cinema na sexta com eles",
        "as janelas da casa ficam abertas para o vento entrar",
        "no verão a praia fica cheia de gente do norte"),
      "nl" -> Seq(
        "de kat slaapt op de bank en de hond ligt er naast",
        "het is niet makkelijk om een huis te vinden in de stad",
        "wij gaan met de trein naar het strand voor een dagje uit",
        "zijn er nog kaartjes voor de film van vanavond in de zaal",
        "dat boek van die schrijver is een van de beste",
        "ik moet morgen vroeg op om aan het werk te gaan",
        "de kinderen spelen buiten maar het begint te regenen",
        "een vriend van mij woont aan de rand van het bos",
        "het eten is klaar en iedereen zit al aan tafel te wachten",
        "zij is niet bang voor de grote hond van de buren"),
      "ru" -> Seq(
        "и он не знал что делать с этим письмом",
        "мы пошли в лес за грибами но ничего не нашли",
        "это было на прошлой неделе когда он приехал из города",
        "она смотрела на него и не могла сказать ни слова",
        "как всегда по утрам он пьёт чай с хлебом",
        "в доме было тихо и только часы шли на стене",
        "что он сказал не имело значения для неё и для нас",
        "его брат работает на заводе за рекой с весны",
        "но из этого ничего не вышло как мы и думали",
        "я не понимаю что это значит но это важно"),
      "zh" -> Seq(
        "我 在 中 国 的 大 学 里 有 一 个 朋 友",
        "他 是 我 的 老 师 也 是 我 的 朋 友",
        "这 个 人 不 是 我 们 的 同 学",
        "我 们 在 大 学 里 学 到 了 很 多",
        "他 来 中 国 是 为 了 看 他 的 家 人",
        "我 的 书 在 他 的 家 里",
        "这 是 不 是 你 的 东 西",
        "大 家 都 在 上 课 他 不 在",
        "我 有 一 个 大 的 家",
        "他 不 来 我 们 也 不 去"),
      "ja" -> Seq(
        "これ は 私 の 本 で ある",
        "彼 は 学校 に 行く こと が できる",
        "私 の 犬 は 庭 に いる",
        "彼女 は 本 を 読んで いる と 思う",
        "その 人 が 来た の で 私 も 行く",
        "これ を 見る と 彼 の 顔 が 変わる",
        "雨 が 降って いる の で 家 に いる",
        "私 は それ を した こと が ある",
        "彼 ら は 町 に 住んで いる と 聞いた",
        "子供 が 公園 で 遊んで いる の を 見た"))
    val df = corpus.flatMap { case (lang, texts) => texts.map(lang -> _) }
      .toDF("expected", "text")
      .select($"expected", TextFunctions.language_id($"text").as("guess"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = df.groupBy(_._1).map { case (lang, rows) =>
      lang -> rows.count { case (e, g) => e == g }.toDouble / rows.length
    }.toSeq.sortBy(_._1)
    byLang.foreach { case (lang, acc) => info(f"$lang accuracy = $acc%.2f") }
    val failing = byLang.filter(_._2 < 0.8)
    assert(failing.isEmpty,
      s"languages below the 0.8 floor: ${failing.map { case (l, a) => f"$l=$a%.2f" }.mkString(", ")}")
  }

  test("language_id accuracy on the sf0.01 corpus is pinned") {
    // The synthetic corpus's `lang` label is NOT reflected in the text:
    // every document draws from the same English-ish technical vocabulary
    // ("window merge spark ..."), whatever its label says. So the honest
    // corpus-level assertions are (a) the classifier never hallucinates a
    // non-English language on this vocabulary, and (b) accuracy on the
    // en-labeled subset stays pinned — 198/218 = 90.8% at last measure
    // (docs with no stopword hits at all fall back to "und").
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"lang", TextFunctions.language_id($"text").as("guess"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(docs.nonEmpty)
    val spurious = docs.filter { case (_, g) => g != "en" && g != "und" }
    assert(spurious.isEmpty,
      s"non-English guesses on an all-English-vocab corpus: ${spurious.take(5).mkString(", ")}")
    val en = docs.filter(_._1 == "en")
    val acc = en.count { case (_, g) => g == "en" }.toDouble / en.length
    assert(acc >= 0.85, f"en-subset accuracy $acc%.3f fell below 0.85")
  }

  test("embedding-cosine near-dup finds planted duplicates, not noise") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dupes = emb.limit(10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label")
    val corpus = emb.union(dupes)
    val pairs = EmbeddingDedup.cosinePairs(corpus, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every planted exact duplicate pair is found
    for (i <- 0L until 10L)
      assert(pairs.contains((i, i + 100000L)), s"missing planted pair $i")
    // keep-decisions collapse each planted pair to the original id
    val keep = EmbeddingDedup.keepDecisions(corpus, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 10L) assert(keep(i + 100000L) == i)
  }

  test("semDedupKeep drops exactly one of each planted pair, keeps edges") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".cast("long").as("id"), $"embedding".cast("array<double>").as("vec"))
    val dupes = emb.where($"id" < 10)
      .select(($"id" + 100000L).as("id"), $"vec")
    val out = EmbeddingDedup.semDedupKeep(emb.union(dupes), "id", "vec",
      nlist = 8, threshold = 0.97)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.length == emb.count() + 10)
    // each planted exact-copy pair loses exactly its higher id (equal
    // csim -> tie to the lower id, the paper's deterministic order)
    val dropped = out.filter(!_._4).map(_._1).toSet
    assert((0L until 10L).forall(i => dropped.contains(i + 100000L) && !dropped.contains(i)),
      s"planted pairs not collapsed to originals: $dropped")
    // nothing else in this corpus sits at cosine >= 0.97 (max natural
    // pair ~0.5), so the planted copies are the only drops
    assert(dropped.size == 10, s"unexpected drops: ${dropped.filter(_ < 100000L)}")
    // determinism: a second run returns the identical decision set
    val again = EmbeddingDedup.semDedupKeep(emb.union(dupes), "id", "vec",
      nlist = 8, threshold = 0.97)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
    assert(out.map(r => (r._1, r._4)).toSet == again)
    // threshold monotonicity: the keep-priority order is τ-independent,
    // so raising τ only removes pairs — every doc kept at a LOWER τ is
    // kept at a higher one
    val loose = EmbeddingDedup.semDedupKeep(emb.union(dupes), "id", "vec",
      nlist = 8, threshold = 0.5)
      .collect().filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val strictKeeps = again.filter(_._2).map(_._1)
    assert(loose.subsetOf(strictKeeps),
      s"kept at τ=0.5 but dropped at τ=0.97: ${loose -- strictKeeps}")
  }

  test("semDedupKeep leaves nothing pinned in the cache manager") {
    // the assignment table is an eager localCheckpoint (ContextCleaner-
    // reclaimable), NOT a Dataset.persist — a persist() from inside an
    // operator has no unpersist site and would pin blocks in the
    // CacheManager for the life of the session
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id".cast("long").as("id"), $"embedding".cast("array<double>").as("vec"))
    EmbeddingDedup.semDedupKeep(emb, "id", "vec", nlist = 8).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "semDedupKeep left a pinned CacheManager entry behind")
  }

  test("tfidfTopTerms ranks rare terms above common ones, rational scores") {
    import graft.pipeline.Dedup
    val docs = Seq(
      (1L, "common common rare1 common"),
      (2L, "common other rare2"),
      (3L, "common other filler")).toDF("doc_id", "text")
    val out = Dedup.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    // doc 1: rare1 df=1 score=1*3/1=3.0 beats common tf=3 df=3 score=3.0?
    // common: 3*3/3 = 3.0 ties rare1 at 3.0 -> term asc: "common" first
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == Seq("common", "rare1"))
    // doc 2: rare2 score 3.0, other df=2 score 1.5, common score 1.0
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq("rare2", "other"))
    val rare2 = out.find(r => r._1 == 2L && r._2 == "rare2").get
    assert(rare2._5 == 3.0 && rare2._3 == 1L && rare2._4 == 1L)
  }

  test("pmiPairs ranks exclusive co-occurrence above background, df filter is lossless") {
    import graft.pipeline.Dedup
    // x and y ALWAYS co-occur (2 docs each, 2 together); bg is everywhere.
    // rare appears once — under minSupport, must not surface in any pair.
    val docs = Seq(
      (1L, "x y bg"), (2L, "x y bg rare"),
      (3L, "bg filler"), (4L, "bg filler")).toDF("doc_id", "text")
    val out = Dedup.pmiPairs(docs, "doc_id", "text", minSupport = 2L, k = 10)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(5), r.getInt(6)))
    val byPair = out.map(x => x._1 -> x).toMap
    // lift(x,y) = 2*4/(2*2) = 2.0 — the top pair
    assert(byPair(("x", "y"))._3 == 2.0 && byPair(("x", "y"))._4 == 1)
    // lift(bg,x) = 2*4/(4*2) = 1.0
    assert(byPair(("bg", "x"))._3 == 1.0)
    // rare (df=1) and any pair with it are filtered out losslessly
    assert(!out.exists(p => p._1._1 == "rare" || p._1._2 == "rare"))
    // filler pairs only with bg: lift = 2*4/(4*2) = 1.0
    assert(byPair(("bg", "filler"))._3 == 1.0)
    // global top-k is TakeOrderedAndProject, not a full-sort exchange
    val plan = Dedup.pmiPairs(docs, "doc_id", "text", 2L, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("corpusReport: one-row dataset card with exact-integer metrics") {
    import graft.pipeline.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog in town", "en", "s1"),
      (2L, "the quick brown fox jumps over a lazy dog in town", "en", "s2"),
      (3L, "contact me at bob@example.com for the offer and a deal", "en", "s1"),
      (4L, "x", "fr", "s3")).toDF("doc_id", "text", "lang", "source")
    val r = Dedup.corpusReport(docs, "doc_id", "text", "lang", "source").head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("distinct_texts") == 3L) // docs 1,2 identical
    assert(r.getAs[Double]("dup_rate") == 0.25)
    assert(r.getAs[Long]("n_langs") == 2L && r.getAs[Long]("n_sources") == 3L)
    assert(r.getAs[Long]("pii_docs") == 1L)
    assert(r.getAs[Long]("total_tokens") ==
      docs.collect().map(_.getString(1).split(" ").length.toLong).sum)
  }

  test("pl_feature_hash: signed buckets, linearity under repetition") {
    val r = spark.sql(
      "SELECT pl_feature_hash(array('the', 'cat', 'the'), 8, 5) AS v")
      .head().getSeq[Long](0)
    assert(r.length == 8)
    // 'the' appears twice: its bucket carries +/-2, 'cat' +/-1 (possibly
    // the same bucket); total absolute mass is 3 when separate
    assert(r.map(math.abs).sum == 3 || r.map(math.abs).sum == 1,
      r.toString) // |2 + 1| or |2 - 1| when colliding
    val single = spark.sql(
      "SELECT pl_feature_hash(array('the'), 8, 5) AS v")
      .head().getSeq[Long](0)
    // doubling a token doubles its contribution in place
    val double = spark.sql(
      "SELECT pl_feature_hash(array('the', 'the'), 8, 5) AS v")
      .head().getSeq[Long](0)
    assert(double == single.map(_ * 2))
    // seed changes the layout
    val other = spark.sql(
      "SELECT pl_feature_hash(array('the'), 8, 6) AS v")
      .head().getSeq[Long](0)
    assert(other != single || true) // layout may coincide; at least runs
    // dim guard
    intercept[Exception] {
      spark.sql("SELECT pl_feature_hash(array('x'), 1, 0)").collect()
    }
  }

  test("bm25 matches the closed-form score on a hand corpus") {
    import graft.pipeline.Dedup
    // 3 docs; query = (cat, dog). df(cat)=2, df(dog)=1; dls 4, 3, 3
    val docs = Seq(
      (1L, "cat dog cat fish"), (2L, "cat bird tree"),
      (3L, "fish bird tree")).toDF("id", "text")
    val got = Dedup.bm25(docs, "id", "text", Seq("cat", "dog"), 1200, 750, 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val k1 = 1200 / 1000.0; val b = 750 / 1000.0
    val avgdl = 10.0 / 3
    def idf(df: Long): Double = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def term(tf: Long, df: Long, dl: Long): Long =
      math.round(1e6 * idf(df) * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * (dl / avgdl))))
    assert(got(1L) == ((2L, term(2, 2, 4) + term(1, 1, 4), 1)))
    assert(got(2L) == ((1L, term(1, 2, 3), 2)))
    assert(!got.contains(3L)) // no query term -> no row
    // doc 1 hits both terms and the rare one: must rank first
    assert(got(1L)._2 > got(2L)._2)
  }
}
