package graft.nlp

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Tok

/** Quantifies the rule-parser gap against the reference's OWN parser test
  * sentences: the 16 single-root + 2 multi-root biomedical sentences of
  * `tests/utils/test_graphs.py:16-39` (the sentences nalaf parses with
  * spaCy to exercise its path algebra). The reference file loads spaCy at
  * runtime, so the gold POS / head / label annotations here are
  * HAND-DERIVED following the spaCy-English (ClearNLP-style) conventions
  * the reference test itself visualizes via displaCy
  * (`test_graphs.py:92-93`) — reference-grade approximations of the model
  * output, not the model output itself.
  *
  * The measured agreement is reported in SURVEY §2.11's parser row: this
  * spec asserts FLOORS slightly below the measured values so the numbers
  * are regression-guarded, not aspirational. The gap vs a statistical
  * parser is real and documented — the point of this spec is that it is
  * MEASURED (VERDICT r3 "What's missing" #1).
  */
class DepGraphAgreementSpec extends AnyFunSuite {

  /** "word goldUPOS goldHead goldDeprel" per token; head = token index,
    * root annotated as self.
    */
  private val goldSentences: Seq[Seq[String]] = Seq(
    // Arabidopsis cotyledon - specific chloroplast biogenesis factor CYO1
    // is a protein disulfide isomerase .
    Seq(
      "Arabidopsis PROPN 6 compound", "cotyledon NOUN 3 npadvmod",
      "- PUNCT 3 punct", "specific ADJ 6 amod", "chloroplast NOUN 6 compound",
      "biogenesis NOUN 6 compound", "factor NOUN 7 compound",
      "CYO1 PROPN 8 nsubj", "is AUX 8 root", "a DET 12 det",
      "protein NOUN 12 compound", "disulfide NOUN 12 compound",
      "isomerase NOUN 8 attr", ". PUNCT 8 punct"),
    // FKBP12-rapamycin target TOR2 is a vacuolar protein with an
    // associated phosphatidylinositol-4 kinase activity .
    Seq(
      "FKBP12-rapamycin PROPN 1 compound", "target NOUN 2 compound",
      "TOR2 PROPN 3 nsubj", "is AUX 3 root", "a DET 6 det",
      "vacuolar ADJ 6 amod", "protein NOUN 3 attr", "with ADP 6 prep",
      "an DET 12 det", "associated VERB 12 amod",
      "phosphatidylinositol-4 NOUN 11 compound", "kinase NOUN 12 compound",
      "activity NOUN 7 pobj", ". PUNCT 3 punct"),
    // TMEM59 was found to be a ubiquitously expressed , Golgi - localized
    // protein .
    Seq(
      "TMEM59 PROPN 2 nsubjpass", "was AUX 2 auxpass", "found VERB 2 root",
      "to PART 4 aux", "be AUX 2 xcomp", "a DET 12 det",
      "ubiquitously ADV 7 advmod", "expressed VERB 12 amod",
      ", PUNCT 12 punct", "Golgi PROPN 11 npadvmod", "- PUNCT 11 punct",
      "localized VERB 12 amod", "protein NOUN 4 attr", ". PUNCT 2 punct"),
    // This indicates that Mdv1p possesses a Dnm1p - independent
    // mitochondrial targeting signal .
    Seq(
      "This PRON 1 nsubj", "indicates VERB 1 root", "that SCONJ 4 mark",
      "Mdv1p PROPN 4 nsubj", "possesses VERB 1 ccomp", "a DET 11 det",
      "Dnm1p PROPN 8 npadvmod", "- PUNCT 8 punct", "independent ADJ 11 amod",
      "mitochondrial ADJ 11 amod", "targeting NOUN 11 compound",
      "signal NOUN 4 dobj", ". PUNCT 1 punct"),
    // Dnm1p - independent targeting of Mdv1p to mitochondria requires
    // MDV2 .
    Seq(
      "Dnm1p PROPN 2 npadvmod", "- PUNCT 2 punct", "independent ADJ 3 amod",
      "targeting NOUN 8 nsubj", "of ADP 3 prep", "Mdv1p PROPN 4 pobj",
      "to ADP 3 prep", "mitochondria NOUN 6 pobj", "requires VERB 8 root",
      "MDV2 PROPN 8 dobj", ". PUNCT 8 punct"),
    // The activated ROP11 recruits MIDD1 to induce local disassembly of
    // cortical microtubules .
    Seq(
      "The DET 2 det", "activated VERB 2 amod", "ROP11 PROPN 3 nsubj",
      "recruits VERB 3 root", "MIDD1 PROPN 3 dobj", "to PART 6 aux",
      "induce VERB 3 advcl", "local ADJ 8 amod", "disassembly NOUN 6 dobj",
      "of ADP 8 prep", "cortical ADJ 11 amod", "microtubules NOUN 9 pobj",
      ". PUNCT 3 punct"),
    // Conversely , cortical microtubules eliminate active ROP11 from the
    // plasma membrane through MIDD1 .
    Seq(
      "Conversely ADV 4 advmod", ", PUNCT 4 punct", "cortical ADJ 3 amod",
      "microtubules NOUN 4 nsubj", "eliminate VERB 4 root",
      "active ADJ 6 amod", "ROP11 PROPN 4 dobj", "from ADP 4 prep",
      "the DET 10 det", "plasma NOUN 10 compound", "membrane NOUN 7 pobj",
      "through ADP 4 prep", "MIDD1 PROPN 11 pobj", ". PUNCT 4 punct"),
    // GOLPH3L antagonizes GOLPH3 to determine Golgi morphology .
    Seq(
      "GOLPH3L PROPN 1 nsubj", "antagonizes VERB 1 root",
      "GOLPH3 PROPN 1 dobj", "to PART 4 aux", "determine VERB 1 advcl",
      "Golgi PROPN 6 compound", "morphology NOUN 4 dobj", ". PUNCT 1 punct"),
    // HERC2 coordinates ubiquitin - dependent assembly of DNA repair
    // factors on damaged chromosomes .
    Seq(
      "HERC2 PROPN 1 nsubj", "coordinates VERB 1 root",
      "ubiquitin NOUN 4 npadvmod", "- PUNCT 4 punct", "dependent ADJ 5 amod",
      "assembly NOUN 1 dobj", "of ADP 5 prep", "DNA NOUN 8 compound",
      "repair NOUN 9 compound", "factors NOUN 6 pobj", "on ADP 5 prep",
      "damaged VERB 12 amod", "chromosomes NOUN 10 pobj", ". PUNCT 1 punct"),
    // Pivotal role of AtSUVH2 in heterochromatic histone methylation and
    // gene silencing in Arabidopsis .
    Seq(
      "Pivotal ADJ 1 amod", "role NOUN 1 root", "of ADP 1 prep",
      "AtSUVH2 PROPN 2 pobj", "in ADP 1 prep", "heterochromatic ADJ 7 amod",
      "histone NOUN 7 compound", "methylation NOUN 4 pobj", "and CCONJ 7 cc",
      "gene NOUN 10 compound", "silencing NOUN 7 conj", "in ADP 10 prep",
      "Arabidopsis PROPN 11 pobj", ". PUNCT 1 punct"),
    // PHAX and CRM1 are required sequentially to transport U3 snoRNA to
    // nucleoli .
    Seq(
      "PHAX PROPN 4 nsubjpass", "and CCONJ 0 cc", "CRM1 PROPN 0 conj",
      "are AUX 4 auxpass", "required VERB 4 root",
      "sequentially ADV 4 advmod", "to PART 7 aux", "transport VERB 4 xcomp",
      "U3 PROPN 9 compound", "snoRNA NOUN 7 dobj", "to ADP 7 prep",
      "nucleoli NOUN 10 pobj", ". PUNCT 4 punct"),
    // CpSufE activates the cysteine desulfurase CpNifS for chloroplastic
    // Fe - S cluster formation .
    Seq(
      "CpSufE PROPN 1 nsubj", "activates VERB 1 root", "the DET 4 det",
      "cysteine NOUN 4 compound", "desulfurase NOUN 1 dobj",
      "CpNifS PROPN 4 appos", "for ADP 1 prep", "chloroplastic ADJ 12 amod",
      "Fe PROPN 10 compound", "- PUNCT 10 punct", "S PROPN 11 compound",
      "cluster NOUN 12 compound", "formation NOUN 6 pobj", ". PUNCT 1 punct"),
    // YMR313c/TGL3 encodes a novel triacylglycerol lipase located in
    // lipid particles of Saccharomyces cerevisiae .
    Seq(
      "YMR313c/TGL3 PROPN 1 nsubj", "encodes VERB 1 root", "a DET 5 det",
      "novel ADJ 5 amod", "triacylglycerol NOUN 5 compound",
      "lipase NOUN 1 dobj", "located VERB 5 acl", "in ADP 6 prep",
      "lipid NOUN 9 compound", "particles NOUN 7 pobj", "of ADP 9 prep",
      "Saccharomyces PROPN 12 compound", "cerevisiae PROPN 10 pobj",
      ". PUNCT 1 punct"),
    // However , overexpression of ATG21 leads to CPY secretion .
    Seq(
      "However ADV 5 advmod", ", PUNCT 5 punct", "overexpression NOUN 5 nsubj",
      "of ADP 2 prep", "ATG21 PROPN 3 pobj", "leads VERB 5 root",
      "to ADP 5 prep", "CPY PROPN 8 compound", "secretion NOUN 6 pobj",
      ". PUNCT 5 punct"),
    // PP2A colocalizes with shugoshin at centromeres and is required for
    // centromeric protection .
    Seq(
      "PP2A PROPN 1 nsubj", "colocalizes VERB 1 root", "with ADP 1 prep",
      "shugoshin NOUN 2 pobj", "at ADP 1 prep", "centromeres NOUN 4 pobj",
      "and CCONJ 1 cc", "is AUX 8 auxpass", "required VERB 1 conj",
      "for ADP 8 prep", "centromeric ADJ 11 amod", "protection NOUN 9 pobj",
      ". PUNCT 1 punct"),
    // NO_VERB
    Seq("NO_VERB NOUN 0 root"),
    // Import assays with pea ( Pisum sativum ) chloroplasts showed that
    // PyrR and PyrD are taken up and proteolytically processed .
    Seq(
      "Import NOUN 1 compound", "assays NOUN 9 nsubj", "with ADP 1 prep",
      "pea NOUN 8 compound", "( PUNCT 6 punct", "Pisum PROPN 6 compound",
      "sativum PROPN 3 appos", ") PUNCT 6 punct", "chloroplasts NOUN 2 pobj",
      "showed VERB 9 root", "that SCONJ 15 mark", "PyrR PROPN 15 nsubjpass",
      "and CCONJ 11 cc", "PyrD PROPN 11 conj", "are AUX 15 auxpass",
      "taken VERB 9 ccomp", "up ADP 15 prt", "and CCONJ 15 cc",
      "proteolytically ADV 19 advmod", "processed VERB 15 conj",
      ". PUNCT 9 punct"),
    // Consistent with this inference , Arabidopsis or maize ( Zea mays )
    // PyrR ( At3g47390 or GRMZM2G090068 ) restored riboflavin prototrophy
    // to an E. coli ribD deletant strain when coexpressed with the
    // corresponding PyrD protein ( At4g20960 or GRMZM2G320099 ) but not
    // when expressed alone ; the COG3236 domain was unnecessary for
    // complementing activity .
    Seq(
      "Consistent ADJ 18 advcl", "with ADP 0 prep", "this DET 3 det",
      "inference NOUN 1 pobj", ", PUNCT 18 punct",
      "Arabidopsis PROPN 12 compound", "or CCONJ 5 cc", "maize NOUN 5 conj",
      "( PUNCT 10 punct", "Zea PROPN 10 compound", "mays PROPN 7 appos",
      ") PUNCT 10 punct", "PyrR PROPN 18 nsubj", "( PUNCT 14 punct",
      "At3g47390 PROPN 12 appos", "or CCONJ 14 cc",
      "GRMZM2G090068 PROPN 14 conj", ") PUNCT 14 punct",
      "restored VERB 18 root", "riboflavin NOUN 20 compound",
      "prototrophy NOUN 18 dobj", "to ADP 18 prep", "an DET 27 det",
      "E. PROPN 24 compound", "coli PROPN 27 compound",
      "ribD PROPN 27 compound", "deletant ADJ 27 amod", "strain NOUN 21 pobj",
      "when ADV 29 advmod", "coexpressed VERB 18 advcl", "with ADP 29 prep",
      "the DET 34 det", "corresponding ADJ 34 amod", "PyrD PROPN 34 compound",
      "protein NOUN 30 pobj", "( PUNCT 36 punct", "At4g20960 PROPN 34 appos",
      "or CCONJ 36 cc", "GRMZM2G320099 PROPN 36 conj", ") PUNCT 36 punct",
      "but CCONJ 29 cc", "not ADV 43 neg", "when ADV 43 advmod",
      "expressed VERB 29 conj", "alone ADV 43 advmod", "; PUNCT 18 punct",
      "the DET 48 det", "COG3236 PROPN 48 compound", "domain NOUN 49 nsubj",
      "was AUX 18 parataxis", "unnecessary ADJ 49 acomp", "for ADP 50 prep",
      "complementing VERB 53 amod", "activity NOUN 51 pobj",
      ". PUNCT 18 punct"))

  /** Gold UPOS projected into the engine's coarse tagset (r5: ADJ and
    * ADV are first-class engine bins).
    */
  private def mapPos(upos: String): String = upos match {
    case "VERB" | "AUX" => "VERB"
    case "ADP" | "SCONJ" | "CCONJ" | "PART" => "ADP"
    case "DET" => "DET"
    case "PUNCT" => "PUNCT"
    case "NUM" => "NUM"
    case "ADJ" => "ADJ"
    case "ADV" => "ADV"
    case _ => "NOUN" // NOUN/PROPN/PRON/X — the engine has no finer bins
  }

  /** Gold deprel projected into the engine's fixed label vocabulary
    * (r5 additions: amod/advmod/attr/acomp/cc/mark).
    */
  private def mapDep(rel: String): String = rel match {
    case "nsubj" | "nsubjpass" => "nsubj"
    case "dobj" | "obj" => "dobj"
    case "pobj" => "pobj"
    case "prep" | "case" => "prep"
    case "det" => "det"
    case "punct" => "punct"
    case "aux" | "auxpass" | "cop" => "aux"
    case "conj" => "conj"
    case "compound" => "compound"
    case "nummod" => "nummod"
    case "neg" => "neg"
    case "root" => "root"
    case "amod" => "amod"
    case "advmod" => "advmod"
    case "attr" => "attr"
    case "acomp" => "acomp"
    case "cc" => "cc"
    case "mark" => "mark"
    case _ => "dep"
  }

  private def parse(anno: Seq[String]): (IndexedSeq[Tok], Seq[String], Seq[Int], Seq[String]) = {
    val rows = anno.map { s =>
      val Array(w, p, h, d) = s.split(" ")
      (w, p, h.toInt, d)
    }
    var off = 0
    val toks = rows.zipWithIndex.map { case ((w, _, _, _), i) =>
      val t = Tok(i, w, off, off + w.length)
      off += w.length + 1
      t
    }.toIndexedSeq
    (toks, rows.map(r => mapPos(r._2)), rows.map(_._3), rows.map(r => mapDep(r._4)))
  }

  test("measured agreement vs the reference's 18 parser-test sentences") {
    var posOk, headOk, labelOk, las, total = 0
    goldSentences.foreach { anno =>
      val (toks, goldPos, goldHead, goldDep) = parse(anno)
      val predPos = toks.map(t => DepGraph.coarsePos(t.word))
      val predHead = DepGraph.heads(toks)
      val predDep = DepGraph.depLabels(toks, predHead)
      toks.indices.foreach { i =>
        total += 1
        if (predPos(i) == goldPos(i)) posOk += 1
        if (predHead(i) == goldHead(i)) headOk += 1
        if (predDep(i) == goldDep(i)) labelOk += 1
        if (predHead(i) == goldHead(i) && predDep(i) == goldDep(i)) las += 1
      }
    }
    val pos = posOk.toDouble / total
    val uas = headOk.toDouble / total
    val lab = labelOk.toDouble / total
    val lasAcc = las.toDouble / total
    info(f"tokens=$total POS=${pos * 100}%.1f%% UAS=${uas * 100}%.1f%% " +
      f"label=${lab * 100}%.1f%% LAS=${lasAcc * 100}%.1f%%")
    // floors just under the measured values — regression guards for the
    // REPORTED numbers (SURVEY §2.11 parser row), not quality claims
    // r3 flat attachment measured POS 89.3 / UAS 21.1 / label 40.4 /
    // LAS 14.1; the r4 projective rule grammar POS 89.3 / UAS 44.8 /
    // label 51.9 / LAS 34.1; the r5 ADJ/ADV grammar POS 90.4 / UAS 62.2 /
    // label 75.9 / LAS 59.6; the r5b grammar (plural-noun morphology,
    // proper-noun caps, to-infinitives, hyphen compounds, symbol-headed
    // runs, reduced relatives, paren appositions, VP-coordination cc)
    // measures POS 95.6 / UAS 84.8 / label 91.9 / LAS 81.9
    assert(pos >= 0.94, f"POS agreement regressed: $pos%.3f")
    assert(uas >= 0.82, f"UAS regressed: $uas%.3f")
    assert(lab >= 0.89, f"label agreement regressed: $lab%.3f")
    assert(lasAcc >= 0.79, f"LAS regressed: $lasAcc%.3f")
  }
}
