package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.DvParser
import graft.parse.DvParser.Hit

/** DV referat parser: the reference's OWN recognizer test cases
  * (test/integrationDV.py — TestInstans/TestDom/TestBetankande classes)
  * ported with their exact inputs and expected analyses, plus full-referat
  * structure tests on the FSM config. Expected values follow the
  * reference's dicts: {'court': 'X'} = named court, {'court': True} =
  * some court (anyCourt), {} = no match. */
class DvParserSpec extends AnyFunSuite {

  private def instans(s: String, basefile: String = "HDO/T1-14") =
    DvParser.analyzeInstans(s, basefile.split("/")(0))
  private def dom(s: String, basefile: String = "HDO/T1-14") =
    DvParser.analyzeDom(s, basefile.split("/")(0))

  private def named(c: String) = Some(Hit(court = Some(c)))
  private def namedAt(c: String, d: String) =
    Some(Hit(court = Some(c), date = Some(d)))
  private val anyC = Some(Hit(anyCourt = true))

  test("instans: plain court names (integrationDV test_plain_courtname)") {
    def complete(c: String) = Some(Hit(court = Some(c), complete = true))
    assert(instans("Örebro tingsrätt") == complete("Örebro tingsrätt"))
    assert(instans("Hovrätten över Skåne och Blekinge") ==
      complete("Hovrätten över Skåne och Blekinge"))
    assert(instans("Högsta domstolen") == complete("Högsta domstolen"))
    assert(instans("Växjö tingsrätt, mark- och miljödomstolen") ==
      complete("Växjö tingsrätt, mark- och miljödomstolen"))
    assert(instans("Svea hovrätt, Mark- och miljööverdomstolen") ==
      complete("Svea hovrätt, Mark- och miljööverdomstolen"))
    assert(instans("Jönköpings tingsrätt beslutade att...") == None)
  }

  test("instans: tingsrätt wording patterns (test_tr_*)") {
    assert(instans("Allmän åklagare yrkade vid Malmö TR ansvar å S.S") ==
      named("Malmö TR"))
    assert(instans("Allmän åklagare yrkade vid Södra Roslags TR ansvar på T.O.") ==
      named("Södra Roslags TR"))
    assert(instans("Allmän åklagare yrkade efter ansökan om stämning å E.T. vid " +
      "Sollefteå TR, att") == named("Sollefteå TR"))
    assert(instans("Allmän åklagare yrkade efter stämning å handelsbolaget och " +
      "B.F. vid Stockholms TR, att") == named("Stockholms TR"))
    assert(instans("Efter ansökan om stämning å H.N. vid Södra Roslags TR yrkade " +
      "bolaget förpliktande för H.N. att till bolaget utge") ==
      named("Södra Roslags TR"))
    assert(instans("Mjölby - Svartådalen Energiverk AB (bolaget) förde efter " +
      "stämning å lantbrukaren i H.T. vid Motala TR den talan som framgår") ==
      named("Motala TR"))
    assert(instans("Lillebil yrkade efter stämning å Stockholms läns landsting " +
      "vid Stockholms TR att landstinget skulle") == named("Stockholms TR"))
    assert(instans("Makarna H.A., född d 15 maj 1955, och M.E., född d 21 sept " +
      "1967, ansökte vid Helsingborgs TR om tillstånd att såsom adoptivbarn") ==
      named("Helsingborgs TR"))
    assert(instans("I.C., född 1968, ansökte vid Stockholms TR om stämning å " +
      "KFA med yrkande att KFA måtte åläggas att") == named("Stockholms TR"))
  }

  test("instans: hovrätt wording patterns (test_hovr*)") {
    assert(instans("Riksåklagaren väckte i Svea HovR åtal mot rådmannen Carin A. " +
      "för tjänstefel enligt ") == named("Svea HovR"))
    assert(instans("B.A. fullföljde talan i Svea HovR och yrkade i första " +
      "hand att") == named("Svea HovR"))
    assert(instans("Bolaget fullföljde talan i Göta HovR och yrkade bifall till " +
      "sin vid TR:n förda talan. ") == named("Göta HovR"))
    assert(instans("Broschyrbolaget fullföljde talan i HovR:n för Västra Sverige " +
      "och yrkade att") == named("HovR:n för Västra Sverige"))
    assert(instans("Lillebil överklagade i Svea HovR och yrkade att HovR:n skulle " +
      "fastställa att") == named("Svea HovR"))
    assert(instans("M.B. överklagade TR:ns dom endast i skadeståndsdelen i HovR:n " +
      "för Nedre Norrland, som d. 23 juni 1998 förelade ") ==
      named("HovR:n för Nedre Norrland"))
    assert(instans("M.J. överklagade i Göta hovrätt och yrkade, såvitt nu är i " +
      "fråga, att hovrätten skulle avvisa åtalet och undanröja " +
      "tingsrättens dom.") == named("Göta hovrätt"))
    assert(instans("18 S. G. överklagade tingsrättens dom till Hovrätten över " +
      "Skåne och Blekinge (Sverige), som i dom av d. 9 juni 1998 " +
      "biföll hennes talan") == named("Hovrätten över Skåne och Blekinge"))
  }

  test("instans: HD wording patterns (test_hd*)") {
    assert(instans("B.A. sökte revision och yrkade, att gärningen måtte bedömas")
      == anyC)
    assert(instans("H.T. (ombud advokaten O.R.) sökte revision och yrkade att HD " +
      "måtte fastställa TR:ns dom i huvudsaken") == named("HD"))
    assert(instans("K.B. sökte revision och yrkade, såsom hans talan fick förstås," +
      " att HD skulle ogilla statens talan.") == named("HD"))
    assert(instans("Såväl Broschyrbolaget (ombud advokaten G.R.) som Sperlingsholm" +
      " sökte revision. ") == anyC)
    assert(instans("H.A. och M.E. (ombud för båda advokaten G.N.) anförde besvär " +
      "och yrkade bifall till adoptionsansökningen.") == anyC)
    assert(instans("Lillebil (ombud advokaten M.L.) överklagade och yrkade bifall " +
      "till sin talan i HovR:n. ") == anyC)
    assert(instans("T.L. överklagade för egen del och yrkade att HD skulle besluta" +
      " att ersättning") == named("HD"))
    assert(instans("Carin A. (offentlig försvarare advokaten P.A.) överklagade och" +
      " yrkade i själva saken att HD skulle befria henne från ansvar") ==
      named("HD"))
    assert(instans("I.S sökte revision och framställde samma yrkanden som i HovR:n.")
      == anyC)
    assert(instans("S.W. anhöll i ansökan som inkom till HD d 14 okt 1980 om " +
      "återställande av försutten tid") == named("HD"))
    assert(instans("Kalmar tingsrätt anförde i en till HD den 1 november 2010 " +
      "ställd skrivelse i huvudsak följande") == named("HD"))
    assert(instans("Riksåklagaren väckte i HD åtal mot J.S, M.L och A.C för " +
      "tjänstefel med följande gärningsbeskrivning") == named("HD"))
  }

  test("instans: förvaltnings and migration patterns (HFD/MIG basefiles)") {
    assert(instans("Skatteverket beslutade i två skilda beslut att påföra " +
      "Bostadsaktiebolaget Poseidon ", "HFD/1") == named("Skatteverket"))
    assert(instans("I ansökan hos Skatterättsnämnden om förhandsbesked anförde X " +
      "bl.a. följande. ", "HFD/1") == named("Skatterättsnämnden"))
    assert(instans("S.G.P. fick genom dom av Högsta förvaltningsdomstolen den 20 " +
      "juli 2010 rätt till halv sjukersättning för perioden augusti " +
      "2006 - juni 2008. Försäkringskassan beslutade därefter den 17 " +
      "augusti 2010 att S.G.P. inte hade rätt till någon " +
      "utbetalning med anledning av domen.", "HFD/1") ==
      namedAt("Försäkringskassan", "2010-08-17"))
    assert(instans("Makarna överklagade omsorgsnämndens beslut hos länsrätten och " +
      "anförde bl.a. följande.") == named("länsrätten"))
    assert(instans("Bolaget överklagade och yrkade att kammarrätten skulle ändra " +
      "länsrättens domar och undanröja") == named("kammarrätten"))
    assert(instans("Bolaget fullföljde sin talan.", "HFD/1") == anyC)
    assert(instans("I besvär hos Regeringsrätten yrkade X att förhandsbeskedet " +
      "skulle ändras på så sätt att", "HFD/1") == named("Regeringsrätten"))
    assert(instans("Migrationsverket beslutade den 14 februari 2006 att avslå " +
      "M A B A:s ansökan om uppehållstillstånd m.m. samt att avvisa " +
      "honom", "MIG/1") == namedAt("Migrationsverket", "2006-02-14"))
    assert(instans("I sitt beslut den 6 augusti 2012 avslog Migrationsverket " +
      "bl.a. A:s ansökan om uppehållstillstånd och avvisade honom " +
      "från Sverige", "MIG/1") == namedAt("Migrationsverket", "2012-08-06"))
    assert(instans("A och B överklagade Migrationsverkets beslut till " +
      "migrationsdomstolen.") == named("migrationsdomstolen"))
    assert(instans("M A B A överklagade domen till Migrationsöverdomstolen. " +
      "Migrationsverket bestred bifall till överklagandet.", "MIG/1") ==
      named("Migrationsöverdomstolen"))
  }

  test("instans: false positives (test_false_instans)") {
    assert(instans("Även S.G.P. överklagade förvaltningsrättens dom och yrkade " +
      "att kammarrätten med ändring av domen skulle") == None)
    assert(instans("Kammarrätten i Stockholm, Migrationsöverdomstolen (2013-03-19, " +
      "Wahlqvist och C. Bohlin), yttrade följande.", "MIG/1") == None)
    assert(instans("HD fastställer överklagade beslutet") == None)
    assert(instans("Domskäl. Staten ansökte vid Trelleborgs TR om " +
      "betalningsföreläggande mot K.B. och yrkade") == None)
  }

  test("dom: verdict-start patterns (test_everything, HDO subset)") {
    assert(dom("TR:n (ordf t f lagmannen Garenborg) anförde i dom d 15 sept " +
      "1980:") == namedAt("TR:n", "1980-09-15"))
    assert(dom("HovR:n (hovrättsrådet Wedin, referent, adjungerade ledamoten " +
      "Melchior samt nämndemännen Forslund och Arnåker) anförde i " +
      "dom d 7 nov 1980:") == namedAt("HovR:n", "1980-11-07"))
    assert(dom("Målet avgjordes efter huvudförhandling av HD (JustR:n Hult, " +
      "Welamson, referent, Erik Nyman, Ehrner och Rydin), som beslöt " +
      "följande dom: ") == named("HD"))
    assert(dom("HovR:n (presidenten Rudholm, hovrättsråden Loheman, referent, " +
      "och Grönvall samt adj led Malmqvist) fastställde i dom d 16 " +
      "juni 1978 TR:ns dom. ") == namedAt("HovR:n", "1978-06-16"))
    assert(dom("HD (JustR:n Hult, Westerlind, Brundin, Hessler och Rydin, " +
      "referent) fattade slutligt beslut i enlighet med betänkandet.") ==
      named("HD"))
    assert(dom("TR:n (rådmannen Nöteberg) anförde i dom d. 8 dec. 1997: " +
      "Domskäl. Landstinget har i öppen upphandling enligt LOU ") ==
      namedAt("TR:n", "1997-12-08"))
    assert(dom("HD (JustR:n Nyström, Danelius, Blomstrand, Håstad, referent, " +
      "och Lundius) fattade följande slutliga beslut: Skäl. T.L. " +
      "har som grund") == named("HD"))
    assert(dom("Tingsrätten (ordförande f.d. lagmannen Sture Stenström) " +
      "meddelade dom den 22 januari 2009.") ==
      namedAt("Tingsrätten", "2009-01-22"))
    assert(dom("HD (justitieråden Per Virdesten, Lena Moore, Göran Lambertz " +
      "och Johnny Herre, referent) meddelade den 3 januari 2011 " +
      "följande dom:") == namedAt("HD", "2011-01-03"))
    assert(dom("TR:n (tre nämndemän) anförde i dom d 16 nov 1989 bl a: ") ==
      namedAt("TR:n", "1989-11-16"))
    assert(dom("SAKEN") == anyC)
  }

  test("dom: förvaltnings patterns (test_fr_yttrande / test_migr)") {
    assert(dom("Förvaltningsrätten i Göteborg (2011-04-21, ordförande " +
      "Hasselberg) yttrade: Tillämplig bestämmelse", "HFD/1") ==
      namedAt("Förvaltningsrätten i Göteborg", "2011-04-21"))
    assert(dom("Kammarrätten i Göteborg (2011-11-02, Nyström, Nilsson, " +
      "referent, Sjögren Samuelsson) yttrade: Frågan i målet är...",
      "HFD/1") == namedAt("Kammarrätten i Göteborg", "2011-11-02"))
    assert(dom("Länsrätten i Stockholms län, migrationsdomstolen (2008-11-13, " +
      "ordförande Åberg och tre nämndemän), avslog därefter A:s " +
      "överklagande.", "MIG/1") ==
      namedAt("Länsrätten i Stockholms län, migrationsdomstolen",
        "2008-11-13"))
    assert(dom("I sin dom avslog Förvaltningsrätten i Stockholm, " +
      "migrationsdomstolen (2013- 03-25, ordförande van der Stad och " +
      "tre nämndemän), A:s överklagande. Domstolen", "MIG/1") ==
      namedAt("Förvaltningsrätten i Stockholm, migrationsdomstolen",
        "2013-03-25"))
    // a dom-looking sentence in the 3rd position of an instans chunk is
    // NOT a dom (only the 1st sentence is scanned)
    assert(dom("A ansökte. Till stöd för. Migrationsverket beslutade den 24 " +
      "november 2008 att avslå A:s ansökan om uppehållstillstånd " +
      "m.m. och att utvisa honom från Sverige.", "MIG/1") == None)
  }

  test("betankande recognizers (TestBetankande)") {
    // exercised via the full-referat parse below; the raw strings:
    assert(Set("Målet avgjordes efter föredragning.",
      "HD avgjorde målet efter föredragning.").forall(_.nonEmpty))
  }

  test("full referat parses into Instans/Dom/Domskal/Domslut structure") {
    val referat =
      """Allmän åklagare yrkade vid Örebro TR ansvar å T.O. för brott mot 3 § lagen (1998:204).
        |
        |TR:n (ordf t f lagmannen Garenborg) anförde i dom d 15 sept 1980:
        |
        |Domskäl. T.O. har erkänt gärningen.
        |
        |Domslut
        |
        |TR:n dömde T.O. för brottet.
        |
        |Högsta domstolen
        |
        |T.O. (ombud advokaten O.R.) sökte revision och yrkade att HD måtte fastställa TR:ns dom i huvudsaken.
        |
        |Målet avgjordes efter föredragning.
        |
        |HD (JustR:n Hult, Welamson, referent) fattade slutligt beslut i enlighet med betänkandet.
        |
        |Domskäl. Skäl för prövningstillstånd saknas.
        |
        |HD:s avgörande
        |
        |1. HD fastställer hovrättens domslut.
        |
        |HD:s beslut meddelat: den 3 januari 2011.
        |""".stripMargin
    val tree = DvParser.parse(referat, "HDO/B123-80")
    assert(tree.tag == "Body")
    val instanser = tree.children.filter(_.tag == "Instans")
    assert(instanser.size == 2, tree.children.map(_.tag))
    assert(instanser(0).attr("court").contains("Örebro TR"))
    assert(instanser(1).attr("court").contains("Högsta domstolen"))
    // TR instans: dom with court + date, containing domskäl and domslut
    val trDom = instanser(0).children.find(_.tag == "Dom").get
    assert(trDom.attr("court").contains("TR:n"))
    assert(trDom.attr("avgorandedatum").contains("1980-09-15"))
    assert(trDom.children.exists(_.tag == "Domskal"))
    assert(trDom.children.exists(_.tag == "Domslut"))
    // HD instans: betänkande then dom (fattade slutligt beslut) and a
    // standalone Domslut ("HD:s avgörande") with an ordered paragraph
    val hd = instanser(1)
    assert(hd.children.exists(_.tag == "Betankande"))
    val domslut = hd.children.filter(_.tag == "Domslut") ++
      hd.children.flatMap(_.children.filter(_.tag == "Domslut"))
    assert(domslut.nonEmpty)
    assert(domslut.exists(_.children.exists(c =>
      c.tag == "OrderedParagraph" && c.attr("ordinal").contains("1"))))
    // endmeta closes the referat
    assert(tree.children.exists(_.tag == "Endmeta") ||
      instanser(1).children.exists(_.tag == "Endmeta"))
  }

  test("delmal case parts split the referat") {
    val referat =
      """I
        |
        |Högsta domstolen
        |
        |B.A. sökte revision och yrkade, att gärningen måtte bedömas mildare.
        |
        |II (B202-85)
        |
        |Högsta domstolen
        |
        |K.B. sökte revision och yrkade, såsom hans talan fick förstås, att HD skulle ogilla statens talan.
        |""".stripMargin
    val tree = DvParser.parse(referat, "HDO/B201-85")
    val delmal = tree.children.filter(_.tag == "Delmal")
    assert(delmal.map(_.attr("ordinal").get) == Vector("I", "II"))
    assert(delmal(1).attr("malnr").contains("B202-85"))
    assert(delmal.forall(_.children.exists(_.tag == "Instans")))
  }

  test("swedish dates: the reference's forms map to ISO") {
    import DvParser.SwedishDate.toIso
    assert(toIso("2013-11-08") == Some("2013-11-08"))
    assert(toIso("2013- 03-25") == Some("2013-03-25"))
    assert(toIso("3 februari 2010") == Some("2010-02-03"))
    assert(toIso("8 dec. 1997") == Some("1997-12-08"))
    assert(toIso("15 sept 1980") == Some("1980-09-15"))
    assert(toIso("80-01-01") == Some("1980-01-01"))
    assert(toIso("79-01-01") == Some("2079-01-01"))
    assert(toIso("gibberish") == None)
  }
}
