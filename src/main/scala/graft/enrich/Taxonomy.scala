package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's fixed 22-topic taxonomy dimension
  * (`TopicClassfication.py:29-52`, SURVEY.md §1.1/§2.9 L3) as an in-code
  * dimension table — small, broadcast-joined everywhere it is used.
  *
  * The DuckDB oracle side consumes the SAME rows via [[sqlValues]], so the
  * Spark frame and the oracle's `topics` CTE are definitionally identical.
  */
object Taxonomy {

  final case class Topic(id: Int, categoryCode: String, categoryName: String,
                         topicName: String, description: String)

  /** 22 rows verbatim from the reference taxonomy (id, category, topic). */
  val All: Seq[Topic] = Seq(
    Topic(1, "I", "新一代人工智能 (New Generation Artificial Intelligence)", "人工智能基础理论 (AI Fundamental Theory)", "包括前沿基础理论突破、学习推理与决策等。"),
    Topic(2, "I", "新一代人工智能 (New Generation Artificial Intelligence)", "AI核心技术与平台 (Core AI Technologies & Platforms)", "包括深度学习框架、开源算法平台构建、自然语言处理、语音与视频处理、图像图形识别等。"),
    Topic(3, "I", "新一代人工智能 (New Generation Artificial Intelligence)", "人工智能芯片与硬件 (AI Chips & Hardware)", "侧重专用芯片研发。"),
    Topic(4, "II", "量子信息 (Quantum Information)", "量子通信 (Quantum Communication)", "包括城域、城际、自由空间量子通信技术。"),
    Topic(5, "II", "量子信息 (Quantum Information)", "量子计算与模拟 (Quantum Computing & Simulation)", "包括通用量子计算原型机、实用化量子模拟机研制。"),
    Topic(6, "II", "量子信息 (Quantum Information)", "量子精密测量 (Quantum Metrology)", "侧重量子精密测量技术突破。"),
    Topic(7, "III", "集成电路 (Integrated Circuits)", "半导体设计与材料 (Semiconductor Design & Materials)", "包括IC设计工具、关键装备、高纯靶材等。"),
    Topic(8, "III", "集成电路 (Integrated Circuits)", "先进半导体工艺与器件 (Advanced Semiconductor Processes & Devices)", "包括IGBT、MEMS、先进存储技术、宽禁带半导体（碳化硅、氮化镓等）。"),
    Topic(9, "IV", "脑科学与类脑研究 (Brain Science and Brain-like Research)", "认知神经科学与脑图谱 (Cognitive Neuroscience & Brain Mapping)", "包括认知原理分析、脑介观神经联接图谱绘制。"),
    Topic(10, "IV", "脑科学与类脑研究 (Brain Science and Brain-like Research)", "脑疾病与神经发育 (Brain Disorders & Neural Development)", "包括重大脑疾病机理与干预、儿童青少年脑智发育。"),
    Topic(11, "IV", "脑科学与类脑研究 (Brain Science and Brain-like Research)", "脑机接口与类脑计算 (Brain-Computer Interface & Neuromorphic Computing)", "包括类脑计算与脑机融合技术。"),
    Topic(12, "V", "基因与生物技术 (Gene and Biotechnology)", "基因编辑与合成生物学 (Gene Editing & Synthetic Biology)", "包括基因组学研究应用、遗传细胞与遗传育种、合成生物。"),
    Topic(13, "V", "基因与生物技术 (Gene and Biotechnology)", "生物医药与诊断技术 (Biopharmaceuticals & Diagnostics)", "包括生物药、抗体药物、创新疫苗、体外诊断技术。"),
    Topic(14, "V", "基因与生物技术 (Gene and Biotechnology)", "农业与环境生物技术 (Agricultural & Environmental Biotechnology)", "包括农作物、畜禽水产、农业微生物等重大新品种创制。"),
    Topic(15, "V", "基因与生物技术 (Gene and Biotechnology)", "生物安全 (Biosafety)", "侧重生物安全关键技术研究。"),
    Topic(16, "VI", "临床医学与健康 (Clinical Medicine and Health)", "重大疾病机理与防治 (Major Disease Mechanisms & Control)", "包括癌症、心脑血管、呼吸、代谢性疾病，重大传染病、慢性非传染性疾病防治。"),
    Topic(17, "VI", "临床医学与健康 (Clinical Medicine and Health)", "前沿诊疗技术与再生医学 (Advanced Diagnostics/Therapeutics & Regenerative Medicine)", "包括主动健康干预、再生医学、微生物组、新型治疗等前沿技术。"),
    Topic(18, "VII", "深空深海和极地探测 (Deep Space, Deep Sea, and Polar Exploration)", "深空探测与行星科学 (Deep Space Exploration & Planetary Science)", "包括宇宙起源演化、火星环境、小行星巡视等。"),
    Topic(19, "VII", "深空深海和极地探测 (Deep Space, Deep Sea, and Polar Exploration)", "深海与极地科学技术 (Deep Sea & Polar Science/Technology)", "包括深海运载、观测、保障装备，极地立体观测平台、破冰船等。"),
    Topic(20, "VIII", "数理科学 (Mathematical and Physical Sciences)", "基础数学前沿 (Frontiers of Fundamental Mathematics)", "包括数论、代数几何、微分方程、随机分析等。"),
    Topic(21, "IX", "化学科学 (Chemical Sciences)", "合成化学与催化 (Synthetic Chemistry & Catalysis)", "包括精准合成、绿色合成、高效催化、反应机理等。"),
    Topic(22, "IX", "化学科学 (Chemical Sciences)", "表界面化学与材料 (Surface/Interface Chemistry & Materials)", "包括表界面结构、分子组装、外场调控等。")
  )

  val ValidIds: Set[Int] = All.map(_.id).toSet

  def df(s: SparkSession): DataFrame = {
    import s.implicits._
    All.map(t => (t.id, t.categoryCode, t.categoryName, t.topicName, t.description))
      .toDF("id", "category_code", "category_name", "topic_name", "description")
  }

  private def q(v: String): String = "'" + v.replace("'", "''") + "'"

  /** `(id, category_code, topic_name)` VALUES list for DuckDB oracles. */
  def sqlValues: String =
    All.map(t => s"(${t.id}, ${q(t.categoryCode)}, ${q(t.topicName)})")
      .mkString(",\n  ")
}
