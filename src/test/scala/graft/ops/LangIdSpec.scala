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
      ("孩子们想看看新的房子", "zh"),
      ("人们在城市里建造房子", "zh"))
    heldOut.foreach { case (text, expected) =>
      val (_, got) = LangProfiles.classify(text)
      assert(got === expected, s"'$text' classified as $got, want $expected")
    }
  }

  test("classify: token-less text is 'und', profiles are full-rank") {
    assert(LangProfiles.classify("")._2 === "und")
    assert(LangProfiles.classify("   ")._2 === "und")
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
      (4L, "孩子们在街上跑来跑去看房子"),
      (5L, ""),
      (6L, "zzz qqq xxx"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.langId(spark, dir).collect()
    assert(out.length === docs.length)
    out.foreach { r =>
      val text = docs(r.getLong(0).toInt)._2
      val (dists, predicted) = LangProfiles.classify(text)
      assert(r.getString(r.length - 1) === predicted,
        s"doc ${r.getLong(0)}: engine ${r.getString(r.length - 1)} vs ref $predicted")
      LangProfiles.langs.zipWithIndex.foreach { case (l, i) =>
        assert(r.getLong(1 + i) === dists(l), s"doc ${r.getLong(0)} dist_$l")
      }
    }
    // and the labels the fixture intends
    val byId = out.map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(byId(0L) === "en" && byId(1L) === "es" && byId(2L) === "fr" &&
      byId(3L) === "de" && byId(4L) === "zh" && byId(5L) === "und")
    graft.util.Fs.deleteRecursively(dir)
  }
}
