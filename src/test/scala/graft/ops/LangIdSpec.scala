package graft.ops

import graft.SparkTestBase
import graft.functions.LangProfiles
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  test("classify: held-out sentences land on the right language") {
    // none of these sentences appear in the training samples
    val heldOut = Seq(
      ("the weather was nice and they walked to the house", "en"),
      ("what will the people think when everything is new", "en"),
      ("los perros estaban corriendo por las casas de la ciudad", "es"),
      ("la gente queria ver las calles nuevas", "es"),
      ("les maisons de la ville avaient change avec le temps", "fr"),
      ("ce que les gens voulaient voir dans les rues", "fr"),
      ("die freunde wollten neue hauser in der stadt sehen", "de"),
      ("was die menschen in den strassen sahen", "de"),
      ("孩子们想看看新的房子他们说这个世界变了", "zh"),
      ("人们开始在城市里建造很多新的房子了", "zh"),
      ("люди хотели видеть новые дома в городе", "ru"),
      ("дети бежали по улице со своими друзьями", "ru"),
      ("الناس ارادوا ان يروا البيوت الجديدة في المدينة", "ar"),
      ("كان الاطفال يمشون في الشارع مع اصدقائهم", "ar"),
      ("子供たちは新しい家を見たがっていましたなぜならすべてが変わったからです", "ja"),
      ("人々は友達と一緒に通りを歩いていましたそして家を見ました", "ja"))
    heldOut.foreach { case (text, expected) =>
      val (_, margin, got) = LangProfiles.classify(text)
      assert(got === expected, s"'$text' classified as $got (margin $margin), want $expected")
    }
  }

  test("classify: margin gates confidence — uncovered scripts and ties predict 'und'") {
    assert(LangProfiles.classify("")._3 === "und")
    assert(LangProfiles.classify("   ")._3 === "und")
    // Latin-ish gibberish: nearly every gram missing from every profile,
    // so all distances sit at the ng*K ceiling and the margin collapses
    val (_, gibMargin, gib) = LangProfiles.classify("zzqx wqkz xjqv qqzz")
    assert(gib === "und", s"gibberish must be low-confidence (margin $gibMargin)")
    // digits: only the `_` pad gram hits any profile -> top-2 tie, margin 0
    val (_, digMargin, dig) = LangProfiles.classify("12345 67890 24680")
    assert(dig === "und" && digMargin === 0L)
    // a confident prediction carries a LARGE margin (>= 10% of ceiling)
    val (_, enMargin, en) =
      LangProfiles.classify("the people walked through the streets of the town")
    assert(en === "en" && enMargin > 0L)
    LangProfiles.langs.foreach { l =>
      assert(LangProfiles.profiles(l).size === LangProfiles.K,
        s"$l profile must have K grams (training sample too small otherwise)")
    }
  }

  test("langId operator equals the plain-Scala classifier on a held-out corpus") {
    val dir = tmpDir("langid")
    val docs = Seq(
      (0L, "the children were walking through the new streets"),
      (1L, "la gente de la ciudad queria casas nuevas"),
      (2L, "les enfants voulaient voir la ville"),
      (3L, "die kinder wollten die stadt sehen"),
      (4L, "孩子们想看看新的房子他们说这个世界变了"),
      (5L, ""),
      (6L, "zzz qqq xxx"),
      (7L, "дети хотели видеть новые дома"),
      (8L, "الاطفال ارادوا ان يروا البيوت الجديدة"),
      (9L, "子供たちは新しい家を見たがっていました"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.langId(spark, dir).collect()
    assert(out.length === docs.length)
    val nLangs = LangProfiles.langs.size
    out.foreach { r =>
      val text = docs(r.getLong(0).toInt)._2
      val (dists, margin, predicted) = LangProfiles.classify(text)
      assert(r.getString(r.length - 1) === predicted,
        s"doc ${r.getLong(0)}: engine ${r.getString(r.length - 1)} vs ref $predicted")
      assert(r.getLong(1 + nLangs) === margin, s"doc ${r.getLong(0)} margin")
      LangProfiles.langs.zipWithIndex.foreach { case (l, i) =>
        assert(r.getLong(1 + i) === dists(l), s"doc ${r.getLong(0)} dist_$l")
      }
    }
    // and the labels the fixture intends
    val byId = out.map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(byId(0L) === "en" && byId(1L) === "es" && byId(2L) === "fr" &&
      byId(3L) === "de" && byId(4L) === "zh" && byId(5L) === "und" &&
      byId(7L) === "ru" && byId(8L) === "ar" && byId(9L) === "ja")
    graft.util.Fs.deleteRecursively(dir)
  }
}
