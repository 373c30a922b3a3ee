package graft.functions

/** Cavnar–Trenkle (1994, "N-Gram-Based Text Categorization") language
  * profiles — the public, integer-exact statistical language-ID method:
  * a language's profile is its top-K character n-grams (n = 1..3 over
  * `_`-padded lowercased words) ranked by frequency; a document is
  * classified by the OUT-OF-PLACE distance between its own rank profile
  * and each language profile (missing gram = K penalty); the minimum
  * distance wins. Every step is counting, ranking with a total-order tie
  * break (count desc, gram asc), and integer arithmetic — so a SQL twin
  * reproduces it bit-for-bit.
  *
  * Profiles are trained at init from embedded per-language sample text
  * (common-vocabulary sentences authored for this fixture — no external
  * data). A production deployment would train on real per-language
  * corpora through the identical code path.
  */
object LangProfiles {

  /** Profile size K: rank list length and the missing-gram penalty. */
  val K = 64

  val samples: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog and the children " +
      "were walking through the streets with their friends because they " +
      "wanted to see what was happening in the town where everything had " +
      "changed since the war ended and people began building new houses " +
      "this is the way the world works and nothing will ever be the same"),
    "es" -> ("el perro corre por la calle y los ninos estaban caminando por " +
      "las calles con sus amigos porque querian ver lo que estaba pasando " +
      "en la ciudad donde todo habia cambiado desde que termino la guerra " +
      "y la gente comenzo a construir casas nuevas esta es la manera en " +
      "que funciona el mundo y nada volvera a ser lo mismo"),
    "fr" -> ("le chien court dans la rue et les enfants marchaient dans les " +
      "rues avec leurs amis parce que ils voulaient voir ce qui se passait " +
      "dans la ville ou tout avait change depuis la fin de la guerre et " +
      "les gens ont commence a construire de nouvelles maisons cest ainsi " +
      "que le monde fonctionne et rien ne sera plus jamais pareil"),
    "de" -> ("der hund lauft durch die strasse und die kinder gingen durch " +
      "die strassen mit ihren freunden weil sie sehen wollten was in der " +
      "stadt geschah wo sich alles verandert hatte seit der krieg endete " +
      "und die menschen begannen neue hauser zu bauen so funktioniert die " +
      "welt und nichts wird jemals wieder so sein wie es war"),
    "zh" -> ("狗在街上跑孩子们和朋友们在街上走因为他们想看看战争结束后一切都" +
      "变了的城市里发生了什么人们开始建造新房子世界就是这样运转的一切都不会" +
      "再和从前一样了他们说时间会改变所有的事情"),
    "ru" -> ("собака бежит по улице и дети шли по улицам со своими друзьями " +
      "потому что они хотели увидеть что происходит в городе где все " +
      "изменилось после окончания войны и люди начали строить новые дома " +
      "так устроен мир и ничто уже не будет прежним как раньше говорили " +
      "старики время меняет все вещи и всех людей в этом мире"),
    "ar" -> ("الكلب يركض في الشارع والاطفال كانوا يمشون في الشوارع مع " +
      "اصدقائهم لانهم ارادوا ان يروا ما يحدث في المدينة حيث تغير كل شيء " +
      "بعد انتهاء الحرب وبدا الناس في بناء منازل جديدة هكذا يعمل العالم " +
      "ولن يكون اي شيء كما كان من قبل يقول الناس ان الوقت يغير كل شيء"),
    "ja" -> ("犬が通りを走っていて子供たちは友達と一緒に通りを歩いていました" +
      "なぜなら戦争が終わってからすべてが変わった町で何が起こっているのかを" +
      "見たかったからです人々は新しい家を建て始めましたこれが世界の仕組み" +
      "ですそして何も二度と同じにはなりません時間がすべてを変えると言われて" +
      "います"))

  /** All 1..3-grams of one `_`-padded word (codepoint-level). */
  def wordGrams(word: String): Seq[String] = {
    val p = s"_${word}_"
    val cps = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < p.length) {
        val n = Character.charCount(p.codePointAt(i))
        b += p.substring(i, i + n)
        i += n
      }
      b.result()
    }
    for {
      n <- 1 to 3
      i <- 0 to cps.length - n
    } yield cps.slice(i, i + n).mkString
  }

  def textGrams(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty).flatMap(wordGrams)

  /** Rank a gram frequency bag: top-K by (count desc, gram asc), rank 1-based. */
  def rank(grams: Seq[String]): Seq[(String, Int)] =
    grams.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (g, c) => (-c, g) }
      .take(K)
      .zipWithIndex.map { case ((g, _), i) => (g, i + 1) }

  /** lang → (gram → rank), trained once at init. */
  val profiles: Map[String, Map[String, Int]] =
    samples.map { case (lang, txt) => lang -> rank(textGrams(txt)).toMap }

  val langs: Seq[String] = profiles.keys.toSeq.sorted

  /** `und` confidence rule: the best-vs-runner-up distance gap must be
    * at least 1/MarginDenom of the maximum possible distance (ng·K) —
    * integer-exact, so both engines agree bit-for-bit. A script none of
    * the profiles cover scores every language at exactly ng·K (every
    * gram missing), margin 0 → und; a tie between two languages is also
    * margin 0 → und, which removes the old lexicographic tie-break.
    *
    * 1/25 (4%) calibrated on held-out fixtures: genuine short sentences
    * in all eight languages carry margins ≥ 5% of ceiling (the closest:
    * short Spanish against the fr/en Romance overlap), while Latin
    * gibberish and digit runs stay ≤ 3%.
    */
  val MarginDenom = 25

  /** Plain-Scala reference classifier (spec twin). Returns per-language
    * out-of-place distances, the margin (runner-up − best), and the
    * prediction (gram-less text or sub-threshold margin → "und").
    */
  def classify(text: String): (Map[String, Long], Long, String) = {
    val doc = rank(textGrams(text))
    if (doc.isEmpty) return (langs.map(_ -> 0L).toMap, 0L, "und")
    val dists = langs.map { lang =>
      val prof = profiles(lang)
      lang -> doc.map { case (g, rd) =>
        prof.get(g).map(rl => math.abs(rd - rl).toLong).getOrElse(K.toLong)
      }.sum
    }.toMap
    val sorted = dists.values.toSeq.sorted
    val margin = sorted(1) - sorted(0)
    val predicted =
      if (margin * MarginDenom < doc.size.toLong * K) "und"
      else dists.toSeq.sortBy { case (l, d) => (d, l) }.head._1
    (dists, margin, predicted)
  }
}
