package graft.corpus

import graft.util.Hashing

/** Deterministic medical-flavored vocabulary for the synthetic page corpus
  * and gazetteer fixtures (FIXTURES.md §2). Everything derives from fixed
  * literal tables + FNV hashing — no RNG state, no wall-clock — so any scale
  * factor regenerates byte-identically (the SHA-per-url invariant,
  * BASELINE.json input_hint).
  *
  * The shapes mirror the reference ontology (config.yaml:55-97): compositional
  * organ+suffix diseases/surgeries/tests like the real gazetteer entries the
  * reference loads from dictionaries/2022_full.json (utils.py:53-63).
  */
object Vocab {

  val organs: Vector[String] = Vector(
    "心", "肺", "肝", "肾", "胃", "肠", "脑", "骨", "眼", "耳",
    "鼻", "喉", "脾", "胆", "胰", "膀胱", "子宫", "乳腺", "甲状腺", "食管"
  )

  val diseaseSuffixes: Vector[String] = Vector(
    "炎", "癌", "肿瘤", "溃疡", "息肉", "结石", "破裂", "梗死", "衰竭",
    "狭窄", "硬化", "出血", "积水", "囊肿"
  )

  val surgerySuffixes: Vector[String] = Vector(
    "切除术", "修补术", "移植术", "引流术", "成形术", "吻合术"
  )

  val testSuffixes: Vector[String] = Vector("检查", "造影", "超声", "活检")

  val symptoms: Vector[String] = Vector(
    "疼痛", "肿胀", "麻木", "乏力", "发热", "咳嗽", "恶心", "呕吐", "眩晕",
    "水肿", "心悸", "气促", "腹泻", "便血", "黄疸", "消瘦", "盗汗", "呼吸困难",
    "食欲不振", "意识障碍"
  )

  val drugSyllables: Vector[String] = Vector(
    "阿", "莫", "西", "林", "头", "孢", "拉", "定", "氯", "苯",
    "米", "松", "酮", "洛", "尔", "卡", "培", "他", "汀", "辛"
  )

  val fluids: Vector[String] = Vector("血液", "尿液", "胸水", "脑脊液", "唾液", "汗液")

  val equipment: Vector[String] = Vector("导管", "支架", "起搏器", "内镜", "呼吸机", "监护仪")

  val objects: Vector[String] = Vector("酒精", "生理盐水", "葡萄糖", "碘伏")

  val organisms: Vector[String] = Vector("细菌", "病毒", "真菌", "支原体", "衣原体")

  /** Deterministic pick from a table. */
  def pick[T](table: Vector[T], parts: String*): T =
    table(((Hashing.fnv1a64(parts.mkString("")) & Long.MaxValue) %
      table.length).toInt)

  val diseases: Vector[String] =
    (for (o <- organs; s <- diseaseSuffixes) yield o + s)

  val surgeries: Vector[String] =
    (for (o <- organs; s <- surgerySuffixes) yield o + s)

  val tests: Vector[String] =
    (for (o <- organs; s <- testSuffixes) yield o + s)

  /** 60 pseudo drug names of 3-4 syllables, hashed deterministically. */
  val drugs: Vector[String] = (0 until 60).toVector.map { i =>
    val n = 3 + (Hashing.fnv1a64("druglen", i.toString) & 1L).toInt
    (0 until n).map { k =>
      pick(drugSyllables, "drug", i.toString, k.toString)
    }.mkString
  }.distinct

  /** The full gazetteer: surface → TYPE (uppercase). */
  val fullDict: Map[String, String] =
    diseases.map(_ -> "DIS").toMap ++
      surgeries.map(_ -> "SUR").toMap ++
      tests.map(_ -> "TES").toMap ++
      symptoms.map(_ -> "SYM").toMap ++
      drugs.map(_ -> "DRU").toMap ++
      organs.map(_ -> "ORG").toMap ++
      fluids.map(_ -> "BFL").toMap ++
      equipment.map(_ -> "EQM").toMap ++
      objects.map(_ -> "OBJ").toMap ++
      organisms.map(_ -> "OGN").toMap

  /** surface → 2-letter jieba-style tag, the trie payload
    * (config.yaml:80-97 inversion).
    */
  val jiebaDict: Map[String, String] = fullDict.map { case (w, t) =>
    w -> graft.model.Ontology.jiebaInverted.getOrElse(t, "x")
  }

  /** Refined dictionary = deterministic ~60% subset (prob 0.95 vs 0.9,
    * clean_and_save.py:484-490).
    */
  val refinedDict: Map[String, String] =
    fullDict.filter { case (w, _) => Hashing.unit("refined", w) < 0.6 }

  /** Suffix dictionary driving round_2 suffix_combiner
    * (clean_and_save.py:248-258): suffix surface → TYPE.
    */
  val suffixDict: Map[String, String] =
    diseaseSuffixes.map(_ -> "DIS").toMap ++
      surgerySuffixes.map(_ -> "SUR").toMap ++
      testSuffixes.map(_ -> "TES").toMap ++
      Map("手术" -> "SUR", "不适" -> "SYM")
}
