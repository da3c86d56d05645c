package graft.tools

import graft.dict.{AhoCorasick, EnvoDict}

/** Scratch diagnostics: dump automaton output for the fixture texts. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dict = EnvoDict.load()
    val ac = AhoCorasick.build(dict)
    val texts = Seq(
      "Everglades wetlands",
      "lake water at 5 m depth during dry season",
      "downstream along river bank",
      "aphotic layer; anoxic zone; tucurui hydroeletric power plant reservoir",
      "bacterioplankton sample from lake",
      "the OCEAN was calm",
      "the ocean was calm",
      "Marine sediment",
      "marine sediment",
      "fresh air",
      "lake mud of the lake",
      "marine wetland",
      "the ocean was calm near the coral reef",
      "sediment core from the estuary floor",
      "hot spring microbial mat in the geyser field",
      "glacier meltwater stream in the tundra",
      "agricultural soil from a rice paddy",
      "hydrothermal vent fluid sample",
      "mangrove swamp surface water",
      "compost heap in a suburban garden",
      "deep sea brine pool interface",
      "freshwater pond with duckweed cover",
      "SOIL sample number four")
    texts.foreach { t =>
      val spans = ac.tag(t)
      val desc = spans.map(s =>
        s"[${s.start},${s.end})'${s.form}'->" +
          s.envos.map(e => dict.intToCurie.getOrElse(e, e.toString)).mkString("+")).mkString(" ")
      println(s"TEXT: $t\n  $desc")
    }
    // multi-concept forms (not stoplisted in lowercase)
    val multi = dict.formToSerials.filter(_._2.length > 1).keys.toSeq.sorted
    println(s"multi-concept forms (${multi.size}): " + multi.take(40).mkString(", "))
  }
}
