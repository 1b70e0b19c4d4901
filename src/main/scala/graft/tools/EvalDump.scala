package graft.tools

import graft.ner.ModelEval

/** Prints the data-derived eval matrix + vote weights (inspection utility —
  * the spec pins a subset of these).
  */
object EvalDump {
  def main(args: Array[String]): Unit = {
    ModelEval.evalMatrix.toSeq.sortBy(_._1).foreach { case (src, byModel) =>
      byModel.toSeq.sortBy(_._1).foreach { case (m, byType) =>
        byType.toSeq.sortBy(_._1).foreach { case (t, a) =>
          println(f"EVAL $src $m $t ${a(0)}%.6f ${a(1)}%.6f ${a(2)}%.6f ${a(3)}%.6f")
        }
      }
    }
    ModelEval.derivedWeights.toSeq.sortBy(_._1).foreach { case (m, byType) =>
      byType.toSeq.sortBy(_._1).foreach { case (t, w) =>
        println(f"WEIGHT $m $t $w%.6f")
      }
    }
  }
}
