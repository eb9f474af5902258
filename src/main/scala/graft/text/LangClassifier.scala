package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, SQLTransformer, StringIndexer, StringIndexerModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned language identification — the fastText-langid-shaped
  * classifier (Joulin et al. 2017: hashed character-n-gram features into
  * a linear model) that replaces stopword heuristics once a corpus is
  * genuinely multilingual. [[TextAnalysis.languageScores]] remains the
  * deliberately cheap 5-language fast path (en/de/es/fr stopwords + Han
  * detection, one token pass, no model artifact); THIS is the broad
  * path: any label set the training frame carries, scored by a persisted
  * model.
  *
  * Architecture mirrors [[QualityClassifier]]'s train-once/score-many
  * lifecycle: character 2-/3-gram extraction (a SQLTransformer — pure
  * SQL, persists inside the PipelineModel) → HashingTF (no vocabulary
  * fit, no driver state — featurization is a stateless map pass at any
  * corpus size) → StringIndexer (label ids, alphabetic order so ids are
  * reproducible across shuffles) → multinomial logistic regression.
  * Scoring a 100 TB corpus is one map pass with the broadcast model;
  * training needs only the (small) labeled frame.
  *
  * Char n-grams are padded with a leading/trailing space (the fastText
  * word-boundary convention) and lowercased; 2- and 3-grams together
  * separate even close pairs (es/pt, ru/uk, da/sv) given
  * stopword-bearing text, and handle space-free scripts (zh/ja) where
  * word-token features see one giant token.
  */
object LangClassifier {

  // null text coalesces to '' (scored as the empty document) — a null
  // array element would otherwise NPE inside HashingTF executor-side.
  private val GramSql =
    """SELECT *, flatten(array(
      |  transform(sequence(1, greatest(length(__lc_t) - 1, 1)), i -> substring(__lc_t, i, 2)),
      |  transform(sequence(1, greatest(length(__lc_t) - 2, 1)), i -> substring(__lc_t, i, 3))
      |)) AS __lc_grams
      |FROM (SELECT *, concat(' ', lower(coalesce(%s, '')), ' ') AS __lc_t FROM __THIS__)""".stripMargin

  /** Train on a labeled frame: `langCol` holds the language code of each
    * `textCol` document. Any label set works; [[seedCorpus]] provides a
    * 26-language bootstrap when no labeled corpus exists yet. */
  def train(
      df: DataFrame,
      textCol: String,
      langCol: String,
      numFeatures: Int = 1 << 18,
      maxIter: Int = 50,
      regParam: Double = 1e-4): PipelineModel = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    val grams = new SQLTransformer().setStatement(GramSql.format(textCol))
    val tf = new HashingTF()
      .setInputCol("__lc_grams").setOutputCol("__lc_features")
      .setNumFeatures(numFeatures)
    val idx = new StringIndexer()
      .setInputCol(langCol).setOutputCol("__lc_label")
      .setStringOrderType("alphabetAsc") // deterministic label ids
    val lr = new LogisticRegression()
      .setFeaturesCol("__lc_features").setLabelCol("__lc_label")
      .setPredictionCol("__lc_pred")
      .setProbabilityCol("__lc_prob")
      .setRawPredictionCol("__lc_raw")
      .setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(grams, tf, idx, lr)).fit(df)
  }

  /** Score a corpus: adds `lang_pred` (the argmax language code) and
    * `lang_prob` (its probability), dropping every intermediate column.
    * The scoring frame does NOT need a label column — the pipeline's
    * StringIndexer stage is satisfied with a constant placeholder when
    * the training label column is absent. Pure map pass, broadcast
    * model. */
  def score(df: DataFrame, model: PipelineModel): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val si = model.stages.collectFirst { case m: StringIndexerModel => m }
      .getOrElse(sys.error("not a LangClassifier model: no StringIndexer stage"))
    val labels = si.labelsArray(0)
    val in =
      if (df.columns.contains(si.getInputCol)) df
      else df.withColumn(si.getInputCol, lit(labels(0)))
    model.transform(in)
      .withColumn("lang_pred",
        element_at(lit(labels), col("__lc_pred").cast("int") + 1))
      .withColumn("lang_prob",
        round(array_max(vector_to_array(col("__lc_prob"))), 6))
      .drop("__lc_t", "__lc_grams", "__lc_features", "__lc_label",
        "__lc_raw", "__lc_prob", "__lc_pred")
      .drop(if (df.columns.contains(si.getInputCol)) "__lc_none"
        else si.getInputCol)
  }

  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)

  /** A 26-language seed corpus: 8 short, stopword-rich sentences per
    * language — enough signal for the char-n-gram model to separate the
    * label set, intended as the bootstrap training frame (and the
    * planted-truth eval fixture) until a real labeled corpus exists.
    * Languages span 9 scripts: Latin (17), Cyrillic (ru/uk), Greek,
    * Arabic, Hebrew, Devanagari (hi), Han (zh), Kana (ja), Hangul (ko). */
  val seedSentences: Map[String, Seq[String]] = Map(
    "en" -> Seq(
      "the quick brown fox jumps over the lazy dog near the river",
      "this is a short example of plain english text for testing",
      "we should have gone to the market before it started to rain",
      "there are many things that we do not know about the world",
      "she said that the meeting would be held on friday morning",
      "the children were playing in the garden behind the old house",
      "i think this is the best way to solve the problem quickly",
      "they have been working on the project for more than a year"),
    "de" -> Seq(
      "der schnelle braune fuchs springt über den faulen hund am fluss",
      "das ist ein kurzes beispiel für einen einfachen deutschen text",
      "wir hätten vor dem regen auf den markt gehen sollen",
      "es gibt viele dinge die wir über die welt nicht wissen",
      "sie sagte dass die besprechung am freitagmorgen stattfinden würde",
      "die kinder spielten im garten hinter dem alten haus",
      "ich denke das ist der beste weg das problem schnell zu lösen",
      "sie arbeiten seit mehr als einem jahr an dem projekt"),
    "es" -> Seq(
      "el rápido zorro marrón salta sobre el perro perezoso junto al río",
      "este es un ejemplo corto de texto sencillo en español para pruebas",
      "deberíamos haber ido al mercado antes de que empezara a llover",
      "hay muchas cosas que no sabemos sobre el mundo en que vivimos",
      "ella dijo que la reunión se celebraría el viernes por la mañana",
      "los niños estaban jugando en el jardín detrás de la casa vieja",
      "creo que esta es la mejor manera de resolver el problema rápido",
      "ellos han estado trabajando en el proyecto durante más de un año"),
    "fr" -> Seq(
      "le rapide renard brun saute par dessus le chien paresseux près de la rivière",
      "ceci est un court exemple de texte simple en français pour les essais",
      "nous aurions dû aller au marché avant qu'il ne commence à pleuvoir",
      "il y a beaucoup de choses que nous ne savons pas sur le monde",
      "elle a dit que la réunion aurait lieu vendredi matin",
      "les enfants jouaient dans le jardin derrière la vieille maison",
      "je pense que c'est la meilleure façon de résoudre le problème vite",
      "ils travaillent sur le projet depuis plus d'un an déjà"),
    "it" -> Seq(
      "la veloce volpe marrone salta sopra il cane pigro vicino al fiume",
      "questo è un breve esempio di testo semplice in italiano per le prove",
      "avremmo dovuto andare al mercato prima che iniziasse a piovere",
      "ci sono molte cose che non sappiamo sul mondo in cui viviamo",
      "lei ha detto che la riunione si sarebbe tenuta venerdì mattina",
      "i bambini stavano giocando nel giardino dietro la vecchia casa",
      "penso che questo sia il modo migliore per risolvere il problema",
      "loro lavorano al progetto da più di un anno ormai"),
    "pt" -> Seq(
      "a rápida raposa marrom pula sobre o cão preguiçoso perto do rio",
      "este é um exemplo curto de texto simples em português para testes",
      "nós deveríamos ter ido ao mercado antes que começasse a chover",
      "há muitas coisas que não sabemos sobre o mundo em que vivemos",
      "ela disse que a reunião seria realizada na sexta feira de manhã",
      "as crianças estavam brincando no jardim atrás da casa velha",
      "eu acho que esta é a melhor maneira de resolver o problema logo",
      "eles têm trabalhado no projeto há mais de um ano"),
    "nl" -> Seq(
      "de snelle bruine vos springt over de luie hond bij de rivier",
      "dit is een kort voorbeeld van eenvoudige nederlandse tekst",
      "we hadden naar de markt moeten gaan voordat het begon te regenen",
      "er zijn veel dingen die we niet weten over de wereld",
      "ze zei dat de vergadering vrijdagochtend zou plaatsvinden",
      "de kinderen speelden in de tuin achter het oude huis",
      "ik denk dat dit de beste manier is om het probleem op te lossen",
      "ze werken al meer dan een jaar aan het project"),
    "sv" -> Seq(
      "den snabba bruna räven hoppar över den lata hunden vid floden",
      "detta är ett kort exempel på enkel svensk text för provning",
      "vi borde ha gått till marknaden innan det började regna",
      "det finns många saker som vi inte vet om världen",
      "hon sade att mötet skulle hållas på fredag morgon",
      "barnen lekte i trädgården bakom det gamla huset",
      "jag tror att detta är det bästa sättet att lösa problemet",
      "de har arbetat med projektet i mer än ett år"),
    "da" -> Seq(
      "den hurtige brune ræv springer over den dovne hund ved floden",
      "dette er et kort eksempel på enkel dansk tekst til afprøvning",
      "vi burde være gået på markedet før det begyndte at regne",
      "der er mange ting som vi ikke ved om verden",
      "hun sagde at mødet ville blive afholdt fredag morgen",
      "børnene legede i haven bag det gamle hus",
      "jeg tror at dette er den bedste måde at løse problemet på",
      "de har arbejdet på projektet i mere end et år"),
    "fi" -> Seq(
      "nopea ruskea kettu hyppää laiskan koiran yli joen lähellä",
      "tämä on lyhyt esimerkki yksinkertaisesta suomenkielisestä tekstistä",
      "meidän olisi pitänyt mennä torille ennen kuin alkoi sataa",
      "on monia asioita joita emme tiedä maailmasta",
      "hän sanoi että kokous pidettäisiin perjantaiaamuna",
      "lapset leikkivät puutarhassa vanhan talon takana",
      "luulen että tämä on paras tapa ratkaista ongelma nopeasti",
      "he ovat työskennelleet projektin parissa yli vuoden"),
    "pl" -> Seq(
      "szybki brązowy lis przeskakuje nad leniwym psem przy rzece",
      "to jest krótki przykład prostego polskiego tekstu do testów",
      "powinniśmy byli pójść na targ zanim zaczęło padać",
      "jest wiele rzeczy których nie wiemy o świecie",
      "powiedziała że spotkanie odbędzie się w piątek rano",
      "dzieci bawiły się w ogrodzie za starym domem",
      "myślę że to najlepszy sposób na szybkie rozwiązanie problemu",
      "pracują nad projektem od ponad roku"),
    "cs" -> Seq(
      "rychlá hnědá liška skáče přes líného psa u řeky",
      "toto je krátký příklad jednoduchého českého textu na zkoušku",
      "měli jsme jít na trh než začalo pršet",
      "je mnoho věcí které o světě nevíme",
      "řekla že schůzka se bude konat v pátek ráno",
      "děti si hrály na zahradě za starým domem",
      "myslím že toto je nejlepší způsob jak problém rychle vyřešit",
      "na projektu pracují déle než rok"),
    "ro" -> Seq(
      "vulpea maro rapidă sare peste câinele leneș lângă râu",
      "acesta este un exemplu scurt de text simplu în limba română",
      "ar fi trebuit să mergem la piață înainte să înceapă ploaia",
      "sunt multe lucruri pe care nu le știm despre lume",
      "ea a spus că ședința va avea loc vineri dimineața",
      "copiii se jucau în grădina din spatele casei vechi",
      "cred că acesta este cel mai bun mod de a rezolva problema",
      "ei lucrează la proiect de mai bine de un an"),
    "hu" -> Seq(
      "a gyors barna róka átugrik a lusta kutya felett a folyónál",
      "ez egy rövid példa egyszerű magyar szövegre teszteléshez",
      "el kellett volna mennünk a piacra mielőtt elkezdett esni",
      "sok olyan dolog van amit nem tudunk a világról",
      "azt mondta hogy a találkozót péntek reggel tartják",
      "a gyerekek a régi ház mögötti kertben játszottak",
      "azt hiszem ez a legjobb módja a probléma gyors megoldásának",
      "több mint egy éve dolgoznak a projekten"),
    "tr" -> Seq(
      "hızlı kahverengi tilki nehrin yanındaki tembel köpeğin üzerinden atlar",
      "bu test için basit türkçe metnin kısa bir örneğidir",
      "yağmur başlamadan önce pazara gitmeliydik",
      "dünya hakkında bilmediğimiz çok şey var",
      "toplantının cuma sabahı yapılacağını söyledi",
      "çocuklar eski evin arkasındaki bahçede oynuyorlardı",
      "bence sorunu hızlıca çözmenin en iyi yolu bu",
      "bir yıldan fazla süredir proje üzerinde çalışıyorlar"),
    "id" -> Seq(
      "rubah coklat yang cepat melompati anjing malas di dekat sungai",
      "ini adalah contoh singkat teks sederhana dalam bahasa indonesia",
      "kita seharusnya pergi ke pasar sebelum hujan mulai turun",
      "ada banyak hal yang tidak kita ketahui tentang dunia",
      "dia mengatakan bahwa rapat akan diadakan pada jumat pagi",
      "anak anak sedang bermain di kebun di belakang rumah tua",
      "saya pikir ini cara terbaik untuk menyelesaikan masalah dengan cepat",
      "mereka telah mengerjakan proyek itu selama lebih dari setahun"),
    "vi" -> Seq(
      "con cáo nâu nhanh nhẹn nhảy qua con chó lười gần bờ sông",
      "đây là một ví dụ ngắn về văn bản tiếng việt đơn giản",
      "chúng ta lẽ ra nên đi chợ trước khi trời bắt đầu mưa",
      "có rất nhiều điều chúng ta không biết về thế giới",
      "cô ấy nói rằng cuộc họp sẽ được tổ chức vào sáng thứ sáu",
      "bọn trẻ đang chơi trong vườn phía sau ngôi nhà cũ",
      "tôi nghĩ đây là cách tốt nhất để giải quyết vấn đề nhanh chóng",
      "họ đã làm việc trong dự án hơn một năm nay"),
    "ru" -> Seq(
      "быстрая коричневая лиса прыгает через ленивую собаку у реки",
      "это короткий пример простого русского текста для проверки",
      "нам следовало пойти на рынок до того как начался дождь",
      "есть много вещей которых мы не знаем о мире",
      "она сказала что встреча состоится в пятницу утром",
      "дети играли в саду за старым домом",
      "я думаю что это лучший способ быстро решить проблему",
      "они работают над проектом больше года"),
    "uk" -> Seq(
      "швидка коричнева лисиця стрибає через ледачого пса біля річки",
      "це короткий приклад простого українського тексту для перевірки",
      "нам слід було піти на ринок до того як почався дощ",
      "є багато речей яких ми не знаємо про світ",
      "вона сказала що зустріч відбудеться у п'ятницю вранці",
      "діти гралися в саду за старим будинком",
      "я вважаю що це найкращий спосіб швидко вирішити проблему",
      "вони працюють над проєктом понад рік"),
    "el" -> Seq(
      "η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί κοντά στο ποτάμι",
      "αυτό είναι ένα σύντομο παράδειγμα απλού ελληνικού κειμένου",
      "έπρεπε να είχαμε πάει στην αγορά πριν αρχίσει η βροχή",
      "υπάρχουν πολλά πράγματα που δεν γνωρίζουμε για τον κόσμο",
      "είπε ότι η συνάντηση θα γίνει την παρασκευή το πρωί",
      "τα παιδιά έπαιζαν στον κήπο πίσω από το παλιό σπίτι",
      "νομίζω ότι αυτός είναι ο καλύτερος τρόπος να λύσουμε το πρόβλημα",
      "εργάζονται στο έργο για περισσότερο από έναν χρόνο"),
    "ar" -> Seq(
      "الثعلب البني السريع يقفز فوق الكلب الكسول قرب النهر",
      "هذا مثال قصير على نص عربي بسيط للاختبار",
      "كان علينا أن نذهب إلى السوق قبل أن يبدأ المطر",
      "هناك أشياء كثيرة لا نعرفها عن العالم",
      "قالت إن الاجتماع سيعقد صباح يوم الجمعة",
      "كان الأطفال يلعبون في الحديقة خلف المنزل القديم",
      "أعتقد أن هذه أفضل طريقة لحل المشكلة بسرعة",
      "إنهم يعملون على المشروع منذ أكثر من عام"),
    "he" -> Seq(
      "השועל החום המהיר קופץ מעל הכלב העצלן ליד הנהר",
      "זוהי דוגמה קצרה לטקסט עברי פשוט לבדיקה",
      "היינו צריכים ללכת לשוק לפני שהתחיל הגשם",
      "יש הרבה דברים שאיננו יודעים על העולם",
      "היא אמרה שהפגישה תתקיים ביום שישי בבוקר",
      "הילדים שיחקו בגינה מאחורי הבית הישן",
      "אני חושב שזו הדרך הטובה ביותר לפתור את הבעיה מהר",
      "הם עובדים על הפרויקט יותר משנה"),
    "hi" -> Seq(
      "तेज भूरी लोमड़ी नदी के पास आलसी कुत्ते के ऊपर से कूदती है",
      "यह परीक्षण के लिए सरल हिंदी पाठ का एक छोटा उदाहरण है",
      "हमें बारिश शुरू होने से पहले बाजार जाना चाहिए था",
      "दुनिया के बारे में बहुत सी बातें हैं जो हम नहीं जानते",
      "उसने कहा कि बैठक शुक्रवार सुबह होगी",
      "बच्चे पुराने घर के पीछे बगीचे में खेल रहे थे",
      "मुझे लगता है कि समस्या को जल्दी हल करने का यह सबसे अच्छा तरीका है",
      "वे एक साल से अधिक समय से इस परियोजना पर काम कर रहे हैं"),
    "zh" -> Seq(
      "敏捷的棕色狐狸跳过河边那只懒惰的狗",
      "这是一个用于测试的简单中文文本的简短示例",
      "我们应该在下雨之前去市场买东西",
      "关于这个世界我们还有很多不了解的事情",
      "她说会议将在星期五早上举行",
      "孩子们在老房子后面的花园里玩耍",
      "我认为这是快速解决问题的最好方法",
      "他们已经在这个项目上工作了一年多"),
    "ja" -> Seq(
      "素早い茶色の狐は川のそばで怠け者の犬を飛び越える",
      "これはテストのための簡単な日本語テキストの短い例です",
      "雨が降り始める前に市場へ行くべきでした",
      "世界について私たちが知らないことはたくさんあります",
      "彼女は会議が金曜日の朝に開かれると言いました",
      "子供たちは古い家の裏の庭で遊んでいました",
      "これが問題を素早く解決する最良の方法だと思います",
      "彼らは一年以上このプロジェクトに取り組んでいます"),
    "ko" -> Seq(
      "빠른 갈색 여우가 강가에서 게으른 개를 뛰어넘는다",
      "이것은 테스트를 위한 간단한 한국어 텍스트의 짧은 예입니다",
      "비가 오기 전에 시장에 갔어야 했습니다",
      "세상에 대해 우리가 모르는 것이 많이 있습니다",
      "그녀는 회의가 금요일 아침에 열릴 것이라고 말했습니다",
      "아이들은 오래된 집 뒤의 정원에서 놀고 있었습니다",
      "이것이 문제를 빨리 해결하는 가장 좋은 방법이라고 생각합니다",
      "그들은 일 년 넘게 그 프로젝트를 진행하고 있습니다"))

  /** The seed corpus as a DataFrame: (lang, phrase_no, text). */
  def seedCorpus(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    seedSentences.toSeq.sortBy(_._1).flatMap { case (lang, ss) =>
      ss.zipWithIndex.map { case (s, i) => (lang, i, s) }
    }.toDF("lang", "phrase_no", "text")
  }
}
