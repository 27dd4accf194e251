"""Vendored German->English parallel text (offline IWSLT14 stand-in).

The reference trains on HF ``bbaaaa/iwslt14-de-en-preprocess``
(``project/run_machine_translation.py:22-54``); this environment has no
network egress, so this module vendors a small *genuine* parallel corpus:

* ~300 hand-written sentence pairs of natural German with idiomatic English
  translations (verb-final subordinate clauses, separable verbs, modal
  constructions, perfect tense, questions, negation -- the phenomena that
  make de-en MT non-trivial), and
* template families with morphologically safe slots (city names, weekdays,
  plural nouns, clock times, family members, countries, gendered
  professions, colour+object noun phrases with baked-in case/gender
  agreement) expanding to ~41,000 additional genuine pairs — within 4x of
  IWSLT14's filtered size — including three- and four-slot families whose
  held-out split recombines all axes in unseen ways.

Unlike the deterministic-lexicon synthetic corpus (``translation.py``),
held-out sentences here combine words and constructions in ways the train
split never shows, so validation BLEU measures real generalisation instead
of saturating at ~100.
"""

from __future__ import annotations

import random
from typing import Dict, List

# ---------------------------------------------------------------------------
# Hand-written pairs: natural German, idiomatic English.
# ---------------------------------------------------------------------------

HAND_PAIRS: List[tuple] = [
    ("ich weiß nicht , wo ich meine schlüssel hingelegt habe .",
     "i do not know where i put my keys ."),
    ("wenn es morgen regnet , bleiben wir zu hause .",
     "if it rains tomorrow , we will stay at home ."),
    ("sie hat mir gesagt , dass sie später kommt .",
     "she told me that she is coming later ."),
    ("der zug hatte zwanzig minuten verspätung .",
     "the train was twenty minutes late ."),
    ("kannst du mir bitte das salz reichen ?",
     "can you please pass me the salt ?"),
    ("wir haben gestern einen langen spaziergang gemacht .",
     "we took a long walk yesterday ."),
    ("das buch , das du mir empfohlen hast , war wirklich spannend .",
     "the book you recommended to me was really exciting ."),
    ("er steht jeden morgen um sechs uhr auf .",
     "he gets up at six o'clock every morning ."),
    ("ich habe vergessen , die tür abzuschließen .",
     "i forgot to lock the door ."),
    ("obwohl sie müde war , arbeitete sie weiter .",
     "although she was tired , she kept working ."),
    ("die kinder spielen im garten hinter dem haus .",
     "the children are playing in the garden behind the house ."),
    ("darf ich ihnen eine frage stellen ?",
     "may i ask you a question ?"),
    ("wir müssen uns beeilen , sonst verpassen wir den bus .",
     "we have to hurry , otherwise we will miss the bus ."),
    ("mein bruder studiert medizin an der universität .",
     "my brother studies medicine at the university ."),
    ("es tut mir leid , dass ich zu spät gekommen bin .",
     "i am sorry that i arrived late ."),
    ("sie interessiert sich sehr für moderne kunst .",
     "she is very interested in modern art ."),
    ("der film beginnt in einer halben stunde .",
     "the film starts in half an hour ."),
    ("ich habe keine lust , heute abend auszugehen .",
     "i do not feel like going out tonight ."),
    ("je länger ich darüber nachdenke , desto unsicherer werde ich .",
     "the longer i think about it , the more uncertain i become ."),
    ("haben sie schon einmal deutschland besucht ?",
     "have you ever visited germany ?"),
    ("das wetter soll am wochenende besser werden .",
     "the weather is supposed to get better on the weekend ."),
    ("er hat sich beim fußballspielen das bein gebrochen .",
     "he broke his leg playing football ."),
    ("ich rufe dich an , sobald ich angekommen bin .",
     "i will call you as soon as i have arrived ."),
    ("die besprechung wurde auf nächste woche verschoben .",
     "the meeting was postponed until next week ."),
    ("könntest du das fenster zumachen ? es zieht .",
     "could you close the window ? there is a draught ."),
    ("sie spricht drei sprachen fließend .",
     "she speaks three languages fluently ."),
    ("wir freuen uns sehr auf euren besuch .",
     "we are very much looking forward to your visit ."),
    ("ich habe den ganzen tag noch nichts gegessen .",
     "i have not eaten anything all day ."),
    ("der arzt hat ihm geraten , mehr sport zu treiben .",
     "the doctor advised him to do more exercise ."),
    ("weißt du , wann der nächste zug nach berlin fährt ?",
     "do you know when the next train to berlin leaves ?"),
    ("das ist die beste suppe , die ich je gegessen habe .",
     "this is the best soup i have ever eaten ."),
    ("sie hat die prüfung beim ersten versuch bestanden .",
     "she passed the exam on her first attempt ."),
    ("ohne deine hilfe hätte ich das nie geschafft .",
     "i would never have managed that without your help ."),
    ("die preise sind in den letzten jahren stark gestiegen .",
     "prices have risen sharply in recent years ."),
    ("er tut so , als ob nichts passiert wäre .",
     "he acts as if nothing had happened ."),
    ("ich muss morgen früh zum zahnarzt gehen .",
     "i have to go to the dentist tomorrow morning ."),
    ("unsere nachbarn sind letzte woche umgezogen .",
     "our neighbours moved last week ."),
    ("es gibt viele gründe , warum das projekt gescheitert ist .",
     "there are many reasons why the project failed ."),
    ("bitte vergiss nicht , die blumen zu gießen .",
     "please do not forget to water the flowers ."),
    ("sie arbeitet seit zehn jahren bei derselben firma .",
     "she has been working at the same company for ten years ."),
    ("wie lange dauert die fahrt zum flughafen ?",
     "how long does the journey to the airport take ?"),
    ("ich bin mir nicht sicher , ob das eine gute idee ist .",
     "i am not sure whether that is a good idea ."),
    ("das konzert war so laut , dass mir die ohren wehtaten .",
     "the concert was so loud that my ears hurt ."),
    ("man kann nie wissen , was die zukunft bringt .",
     "you can never know what the future holds ."),
    ("er hat mir versprochen , pünktlich zu sein .",
     "he promised me to be on time ."),
    ("die katze schläft am liebsten auf dem sofa .",
     "the cat likes sleeping on the sofa best ."),
    ("wir sollten öfter zusammen kochen .",
     "we should cook together more often ."),
    ("ich verstehe nicht , was du damit meinst .",
     "i do not understand what you mean by that ."),
    ("nachdem wir gegessen hatten , gingen wir spazieren .",
     "after we had eaten , we went for a walk ."),
    ("sie hat angst , vor vielen leuten zu sprechen .",
     "she is afraid of speaking in front of many people ."),
    ("der laden ist sonntags geschlossen .",
     "the shop is closed on sundays ."),
    ("ich hätte gern einen tisch für zwei personen .",
     "i would like a table for two people ."),
    ("mein computer ist schon wieder abgestürzt .",
     "my computer crashed again ."),
    ("die sonne geht im winter früher unter .",
     "the sun sets earlier in winter ."),
    ("hast du schon von der neuen regelung gehört ?",
     "have you heard about the new regulation yet ?"),
    ("er hat seinen job gekündigt , um die welt zu bereisen .",
     "he quit his job in order to travel the world ."),
    ("ich kann mich an seinen namen nicht erinnern .",
     "i cannot remember his name ."),
    ("das museum ist einen besuch wert .",
     "the museum is worth a visit ."),
    ("sie haben das haus ihrer großeltern renoviert .",
     "they renovated their grandparents' house ."),
    ("wenn ich du wäre , würde ich das angebot annehmen .",
     "if i were you , i would accept the offer ."),
    ("der lehrer erklärte die aufgabe noch einmal .",
     "the teacher explained the task once more ."),
    ("wir sind gestern erst nach mitternacht nach hause gekommen .",
     "we did not get home until after midnight yesterday ."),
    ("es lohnt sich , früh aufzustehen .",
     "it is worth getting up early ."),
    ("sie hat sich über das geschenk sehr gefreut .",
     "she was very pleased with the present ."),
    ("ich suche eine wohnung in der nähe des bahnhofs .",
     "i am looking for a flat near the station ."),
    ("das essen in diesem restaurant schmeckt ausgezeichnet .",
     "the food in this restaurant tastes excellent ."),
    ("er liest jeden tag die zeitung beim frühstück .",
     "he reads the newspaper at breakfast every day ."),
    ("sie konnte vor aufregung kaum schlafen .",
     "she could hardly sleep from excitement ."),
    ("wir haben uns seit jahren nicht mehr gesehen .",
     "we have not seen each other for years ."),
    ("darf ich mir dein fahrrad ausleihen ?",
     "may i borrow your bicycle ?"),
    ("die straße ist wegen bauarbeiten gesperrt .",
     "the road is closed because of construction work ."),
    ("ich freue mich darauf , dich bald wiederzusehen .",
     "i am looking forward to seeing you again soon ."),
    ("das kind lernt gerade schwimmen .",
     "the child is currently learning to swim ."),
    ("bevor du gehst , solltest du das licht ausmachen .",
     "before you leave , you should turn off the light ."),
    ("seine rede hat einen starken eindruck hinterlassen .",
     "his speech left a strong impression ."),
    ("ich habe mir gestern neue schuhe gekauft .",
     "i bought myself new shoes yesterday ."),
    ("sie wohnt im dritten stock eines alten hauses .",
     "she lives on the third floor of an old house ."),
    ("wir mussten lange auf den bus warten .",
     "we had to wait a long time for the bus ."),
    ("könnten sie das bitte wiederholen ?",
     "could you please repeat that ?"),
    ("der hund bellt jedes mal , wenn es klingelt .",
     "the dog barks every time the doorbell rings ."),
    ("ich habe mich noch nicht entschieden .",
     "i have not decided yet ."),
    ("die bibliothek hat bis acht uhr abends geöffnet .",
     "the library is open until eight in the evening ."),
    ("er hat das problem auf eine kluge weise gelöst .",
     "he solved the problem in a clever way ."),
    ("am liebsten trinke ich morgens einen starken kaffee .",
     "i like drinking a strong coffee in the morning best ."),
    ("sie haben beschlossen , im sommer zu heiraten .",
     "they decided to get married in the summer ."),
    ("es ist schwierig , eine fremdsprache zu lernen .",
     "it is difficult to learn a foreign language ."),
    ("der schnee bedeckte die ganze stadt .",
     "the snow covered the whole city ."),
    ("ich nehme an , dass er die wahrheit sagt .",
     "i assume that he is telling the truth ."),
    ("wir würden gern wissen , wie viel das kostet .",
     "we would like to know how much that costs ."),
    ("das flugzeug ist pünktlich gelandet .",
     "the plane landed on time ."),
    ("sie hilft ihrer mutter oft im haushalt .",
     "she often helps her mother with the housework ."),
    ("ich habe den film schon dreimal gesehen .",
     "i have already seen the film three times ."),
    ("man sollte nicht alles glauben , was im internet steht .",
     "you should not believe everything that is on the internet ."),
    ("der winter in diesem jahr war besonders kalt .",
     "the winter this year was particularly cold ."),
    ("kannst du mir zeigen , wie das funktioniert ?",
     "can you show me how that works ?"),
    ("die firma hat im letzten quartal gute gewinne gemacht .",
     "the company made good profits in the last quarter ."),
    ("er spielt seit seiner kindheit klavier .",
     "he has been playing the piano since his childhood ."),
    ("ich bin gespannt , wie die geschichte ausgeht .",
     "i am curious how the story ends ."),
    ("wir haben im urlaub viele fotos gemacht .",
     "we took many photos on holiday ."),
    ("sie hat vergessen , ihren regenschirm mitzunehmen .",
     "she forgot to take her umbrella with her ."),
    ("je mehr man übt , desto besser wird man .",
     "the more you practise , the better you get ."),
    ("das geschäft bietet diese woche große rabatte an .",
     "the shop is offering big discounts this week ."),
    ("ich möchte mich für ihre hilfe bedanken .",
     "i would like to thank you for your help ."),
    ("der fluss fließt mitten durch die stadt .",
     "the river flows right through the city ."),
    ("sie war überrascht , ihn dort zu sehen .",
     "she was surprised to see him there ."),
    ("er versucht , weniger zucker zu essen .",
     "he is trying to eat less sugar ."),
    ("wir treffen uns einmal im monat zum abendessen .",
     "we meet for dinner once a month ."),
    ("die antwort auf deine frage ist kompliziert .",
     "the answer to your question is complicated ."),
    ("ich habe heute nacht schlecht geschlafen .",
     "i slept badly last night ."),
    ("die schüler bereiten sich auf die prüfungen vor .",
     "the students are preparing for the exams ."),
    ("er hat mir den weg zum bahnhof erklärt .",
     "he explained the way to the station to me ."),
    ("es wird langsam dunkel draußen .",
     "it is slowly getting dark outside ."),
    ("sie hat ihre meinung im letzten moment geändert .",
     "she changed her mind at the last moment ."),
    ("ich kann dieses verhalten nicht akzeptieren .",
     "i cannot accept this behaviour ."),
    ("der alte mann erzählte uns geschichten aus seiner jugend .",
     "the old man told us stories from his youth ."),
    ("wir sollten das problem so schnell wie möglich lösen .",
     "we should solve the problem as quickly as possible ."),
    ("mir ist aufgefallen , dass du heute sehr still bist .",
     "i noticed that you are very quiet today ."),
    ("das dorf liegt hoch oben in den bergen .",
     "the village lies high up in the mountains ."),
    ("sie hat den kuchen selbst gebacken .",
     "she baked the cake herself ."),
    ("ich weiß noch nicht , ob ich kommen kann .",
     "i do not know yet whether i can come ."),
    ("die regierung plant neue gesetze zum umweltschutz .",
     "the government is planning new laws on environmental protection ."),
    ("er verlor seinen schlüssel auf dem weg nach hause .",
     "he lost his key on the way home ."),
    ("wir hören oft musik beim kochen .",
     "we often listen to music while cooking ."),
    ("das meer war heute ruhig und klar .",
     "the sea was calm and clear today ."),
    ("sie fragte mich , ob ich ihr helfen könnte .",
     "she asked me whether i could help her ."),
    ("ich habe mich bei der hausnummer geirrt .",
     "i was mistaken about the house number ."),
    ("der unterricht fällt heute wegen krankheit aus .",
     "class is cancelled today because of illness ."),
    ("es ist wichtig , genug wasser zu trinken .",
     "it is important to drink enough water ."),
    ("die brücke verbindet die beiden stadtteile .",
     "the bridge connects the two districts ."),
    ("er hat sich schnell an das neue leben gewöhnt .",
     "he quickly got used to the new life ."),
    ("ich lasse mein auto in der werkstatt reparieren .",
     "i am having my car repaired at the garage ."),
    ("sie gewann den wettbewerb mit großem vorsprung .",
     "she won the competition by a large margin ."),
    ("wir diskutierten stundenlang über politik .",
     "we discussed politics for hours ."),
    ("ohne brille kann ich die schrift nicht lesen .",
     "i cannot read the writing without glasses ."),
    ("der gast bedankte sich herzlich für die einladung .",
     "the guest thanked us warmly for the invitation ."),
    ("ich bin gestern meinem alten lehrer begegnet .",
     "i ran into my old teacher yesterday ."),
    ("die blätter färben sich im herbst bunt .",
     "the leaves turn colourful in autumn ."),
    ("kannst du bitte leiser sprechen ? das baby schläft .",
     "can you please speak more quietly ? the baby is sleeping ."),
    ("wir haben den gipfel nach vier stunden erreicht .",
     "we reached the summit after four hours ."),
    ("sie übersetzt bücher aus dem französischen .",
     "she translates books from french ."),
    ("es hat keinen sinn , sich darüber zu ärgern .",
     "there is no point in getting annoyed about it ."),
    ("der junge half der alten frau über die straße .",
     "the boy helped the old woman across the street ."),
    ("ich erinnere mich gern an unsere schulzeit .",
     "i like remembering our school days ."),
    ("die suppe ist mir zu salzig .",
     "the soup is too salty for me ."),
    ("er wurde zum kapitän der mannschaft gewählt .",
     "he was elected captain of the team ."),
    ("man hat mir gesagt , ich solle geduldig sein .",
     "i was told to be patient ."),
    ("die aussicht von hier oben ist atemberaubend .",
     "the view from up here is breathtaking ."),
    ("ich habe die rechnung bereits bezahlt .",
     "i have already paid the bill ."),
    ("sie träumt davon , ein eigenes geschäft zu eröffnen .",
     "she dreams of opening her own shop ."),
    ("das experiment hat unsere erwartungen übertroffen .",
     "the experiment exceeded our expectations ."),
    ("wir mussten das spiel wegen des regens abbrechen .",
     "we had to stop the game because of the rain ."),
    ("er nimmt seine arbeit sehr ernst .",
     "he takes his work very seriously ."),
    ("ich würde lieber zu hause bleiben .",
     "i would rather stay at home ."),
    ("die nachricht verbreitete sich sehr schnell .",
     "the news spread very quickly ."),
    ("sie hat mich gebeten , ihr bescheid zu geben .",
     "she asked me to let her know ."),
    ("am ende hat sich alles zum guten gewendet .",
     "in the end everything turned out well ."),
    ("der verkehr ist um diese uhrzeit besonders schlimm .",
     "the traffic is particularly bad at this time of day ."),
    ("ich habe mir den fuß verstaucht .",
     "i sprained my foot ."),
    ("die vorlesung war länger als erwartet .",
     "the lecture was longer than expected ."),
    ("er schenkte ihr einen strauß blumen .",
     "he gave her a bouquet of flowers ."),
    ("wir sind mit dem ergebnis sehr zufrieden .",
     "we are very satisfied with the result ."),
    ("es war nicht leicht , eine entscheidung zu treffen .",
     "it was not easy to make a decision ."),
    ("die tür lässt sich nicht öffnen .",
     "the door cannot be opened ."),
    ("ich gehe davon aus , dass alle einverstanden sind .",
     "i assume that everyone agrees ."),
    ("sie hängte das bild über den schreibtisch .",
     "she hung the picture above the desk ."),
    ("der sturm hat viele bäume umgeworfen .",
     "the storm knocked down many trees ."),
    ("wir verbringen die feiertage bei meinen eltern .",
     "we are spending the holidays at my parents' ."),
    ("könntest du mir einen gefallen tun ?",
     "could you do me a favour ?"),
    ("ich habe große angst vor spinnen .",
     "i am very afraid of spiders ."),
    ("die mannschaft trainiert dreimal pro woche .",
     "the team trains three times a week ."),
    ("er entschuldigte sich für das missverständnis .",
     "he apologised for the misunderstanding ."),
    ("das licht im flur funktioniert nicht mehr .",
     "the light in the hallway does not work anymore ."),
    ("sie setzte sich neben mich und lächelte .",
     "she sat down next to me and smiled ."),
    ("ich muss diese woche viele überstunden machen .",
     "i have to work a lot of overtime this week ."),
    ("die touristen fotografierten das alte rathaus .",
     "the tourists photographed the old town hall ."),
    ("mir fällt gerade kein gutes beispiel ein .",
     "i cannot think of a good example right now ."),
    ("der kuchen riecht wunderbar .",
     "the cake smells wonderful ."),
    ("wir haben uns im urlaub kennengelernt .",
     "we met on holiday ."),
    ("sie versteckte das geschenk unter dem bett .",
     "she hid the present under the bed ."),
    ("ich halte das für einen großen fehler .",
     "i consider that a big mistake ."),
    ("das publikum applaudierte begeistert .",
     "the audience applauded enthusiastically ."),
    ("er kann sehr gut mit kindern umgehen .",
     "he is very good with children ."),
    ("die temperatur sinkt nachts unter null .",
     "the temperature drops below zero at night ."),
    ("ich wurde von einer biene gestochen .",
     "i was stung by a bee ."),
    ("sie müssen an der nächsten haltestelle aussteigen .",
     "you have to get off at the next stop ."),
    ("wir haben lange überlegt , bevor wir das haus gekauft haben .",
     "we thought for a long time before we bought the house ."),
    ("der autor liest heute abend aus seinem neuen roman .",
     "the author is reading from his new novel tonight ."),
    ("ich trage im winter immer eine mütze .",
     "i always wear a hat in winter ."),
    ("die ampel sprang auf rot , als wir ankamen .",
     "the traffic light turned red when we arrived ."),
    ("es freut mich , sie kennenzulernen .",
     "i am pleased to meet you ."),
    ("sie legte das baby vorsichtig ins bett .",
     "she carefully put the baby to bed ."),
    ("der aufzug ist leider außer betrieb .",
     "unfortunately the lift is out of order ."),
    ("ich verlasse mich auf dein urteil .",
     "i rely on your judgement ."),
    ("die sitzung dauerte den ganzen nachmittag .",
     "the meeting lasted the whole afternoon ."),
    ("er wirft nie etwas weg .",
     "he never throws anything away ."),
    ("unsere mannschaft hat das spiel knapp verloren .",
     "our team narrowly lost the game ."),
    ("ich möchte ein zimmer mit blick aufs meer .",
     "i would like a room with a view of the sea ."),
    ("sie erkannte ihn an seiner stimme .",
     "she recognised him by his voice ."),
    ("das kind malte ein bild von seiner familie .",
     "the child drew a picture of its family ."),
    ("wir müssen den termin leider absagen .",
     "unfortunately we have to cancel the appointment ."),
    ("bei nebel sollte man vorsichtig fahren .",
     "one should drive carefully in fog ."),
    ("ich habe das gefühl , dass etwas nicht stimmt .",
     "i have the feeling that something is wrong ."),
    ("die bäckerei an der ecke macht das beste brot .",
     "the bakery on the corner makes the best bread ."),
    ("er öffnete den brief mit zitternden händen .",
     "he opened the letter with trembling hands ."),
    ("die studenten protestierten gegen die neuen gebühren .",
     "the students protested against the new fees ."),
    ("ich bin auf dem weg zur arbeit .",
     "i am on my way to work ."),
    ("sie kümmert sich liebevoll um ihre großmutter .",
     "she lovingly takes care of her grandmother ."),
    ("das wasser im see ist noch zu kalt zum baden .",
     "the water in the lake is still too cold for swimming ."),
    ("er versprach , es nie wieder zu tun .",
     "he promised never to do it again ."),
    ("die zuschauer verließen das stadion enttäuscht .",
     "the spectators left the stadium disappointed ."),
    ("ich würde gern wissen , warum das passiert ist .",
     "i would like to know why that happened ."),
    ("der schriftsteller arbeitet an einem neuen buch .",
     "the writer is working on a new book ."),
    ("wir grillen im sommer oft im garten .",
     "we often barbecue in the garden in summer ."),
    ("sie schaute aus dem fenster und seufzte .",
     "she looked out of the window and sighed ."),
    ("ohne fleiß kein preis .",
     "no pain , no gain ."),
    ("der patient muss noch einige tage im krankenhaus bleiben .",
     "the patient has to stay in hospital for a few more days ."),
    ("ich habe mein passwort schon wieder vergessen .",
     "i forgot my password yet again ."),
    ("die kleine stadt ist für ihren weihnachtsmarkt bekannt .",
     "the small town is known for its christmas market ."),
    ("er brachte mir bei , wie man schach spielt .",
     "he taught me how to play chess ."),
    ("die wolken verzogen sich am nachmittag .",
     "the clouds cleared in the afternoon ."),
    ("ich kann es kaum erwarten , dich zu sehen .",
     "i can hardly wait to see you ."),
    ("sie stellte den teller auf den tisch .",
     "she put the plate on the table ."),
    ("die verhandlungen dauern noch an .",
     "the negotiations are still ongoing ."),
    ("mein vater repariert sein auto immer selbst .",
     "my father always repairs his car himself ."),
    ("das stück wurde von einem jungen komponisten geschrieben .",
     "the piece was written by a young composer ."),
    ("ich gewöhne mich langsam an das frühe aufstehen .",
     "i am slowly getting used to getting up early ."),
    ("die polizei sperrte die straße ab .",
     "the police closed off the street ."),
    ("er sah müde aus , als er nach hause kam .",
     "he looked tired when he came home ."),
    ("wir sammeln geld für einen guten zweck .",
     "we are collecting money for a good cause ."),
    ("sie hörte auf zu reden , als er hereinkam .",
     "she stopped talking when he came in ."),
    ("es gibt noch viel zu tun .",
     "there is still a lot to do ."),
    ("ich schreibe dir , sobald ich mehr weiß .",
     "i will write to you as soon as i know more ."),
    ("die ernte fiel dieses jahr besser aus als erwartet .",
     "the harvest turned out better than expected this year ."),
    ("er hielt die tür für die alte dame auf .",
     "he held the door open for the old lady ."),
    ("ich bin mit dem zug statt mit dem auto gefahren .",
     "i went by train instead of by car ."),
    ("die kollegen gratulierten ihr zur beförderung .",
     "her colleagues congratulated her on the promotion ."),
    ("das gerücht stellte sich als falsch heraus .",
     "the rumour turned out to be false ."),
    ("ich lege das geld für den urlaub zur seite .",
     "i am putting the money aside for the holiday ."),
    ("die lampe hängt zu niedrig über dem tisch .",
     "the lamp hangs too low above the table ."),
    ("er zog sich warm an , bevor er hinausging .",
     "he dressed warmly before he went outside ."),
    ("die wunde heilt nur langsam .",
     "the wound is healing only slowly ."),
    ("ich halte nichts von solchen versprechen .",
     "i do not think much of such promises ."),
    ("die beiden brüder sehen sich sehr ähnlich .",
     "the two brothers look very similar ."),
    ("am bahnhof herrschte großes gedränge .",
     "there was a big crowd at the station ."),
    ("sie hat das zimmer mit frischen blumen geschmückt .",
     "she decorated the room with fresh flowers ."),
    ("der vortrag hat mich zum nachdenken gebracht .",
     "the lecture made me think ."),
    ("wir haben unterwegs eine pause gemacht .",
     "we took a break on the way ."),
    ("er leiht sich ständig geld von seinen freunden .",
     "he constantly borrows money from his friends ."),
    ("das kleid steht dir ausgezeichnet .",
     "the dress suits you excellently ."),
    ("ich bezweifle , dass der plan funktionieren wird .",
     "i doubt that the plan will work ."),
    ("die stadt hat sich in den letzten jahren stark verändert .",
     "the city has changed a lot in recent years ."),
    ("er betrat den raum , ohne zu klopfen .",
     "he entered the room without knocking ."),
    ("die kinder freuen sich schon auf weihnachten .",
     "the children are already looking forward to christmas ."),
    ("man muss den tatsachen ins auge sehen .",
     "one has to face the facts ."),
    ("die milch ist sauer geworden .",
     "the milk has gone sour ."),
    ("ich habe ihm geholfen , den tisch zu decken .",
     "i helped him set the table ."),
    ("der weg zum strand ist ausgeschildert .",
     "the path to the beach is signposted ."),
    ("sie beschäftigt sich viel mit geschichte .",
     "she spends a lot of time on history ."),
    ("das telefon klingelte mitten in der nacht .",
     "the telephone rang in the middle of the night ."),
    ("wir sollten uns auf das wesentliche konzentrieren .",
     "we should concentrate on the essentials ."),
    ("er hat den vertrag noch nicht unterschrieben .",
     "he has not signed the contract yet ."),
    ("die aufführung beginnt pünktlich um acht .",
     "the performance starts punctually at eight ."),
    ("ich halte dich auf dem laufenden .",
     "i will keep you posted ."),
    ("sie hat aus ihren fehlern gelernt .",
     "she learned from her mistakes ."),
    ("der see friert im winter manchmal zu .",
     "the lake sometimes freezes over in winter ."),
    ("ich habe nicht damit gerechnet , dass du kommst .",
     "i did not expect you to come ."),
    ("die arbeiter fordern höhere löhne .",
     "the workers are demanding higher wages ."),
    ("er schaltete den fernseher aus und ging ins bett .",
     "he turned off the television and went to bed ."),
    ("das thema ist mir zu kompliziert .",
     "the subject is too complicated for me ."),
    ("sie nahm ihren mut zusammen und fragte ihn .",
     "she gathered her courage and asked him ."),
    ("in der zwischenzeit können wir den tisch decken .",
     "in the meantime we can set the table ."),
    ("die qualität hat ihren preis .",
     "quality has its price ."),
    ("ich habe den termin in meinen kalender eingetragen .",
     "i entered the appointment in my calendar ."),
    ("die flamme erlosch im wind .",
     "the flame went out in the wind ."),
    ("er behauptet , nichts davon gewusst zu haben .",
     "he claims to have known nothing about it ."),
    ("wir näherten uns langsam dem ziel .",
     "we slowly approached the destination ."),
    ("das angebot gilt nur bis ende des monats .",
     "the offer is only valid until the end of the month ."),
    ("sie war die erste , die das problem bemerkte .",
     "she was the first to notice the problem ."),
    ("ich ziehe mich schnell um und komme dann runter .",
     "i will quickly change and then come down ."),
    ("der bericht muss bis freitag fertig sein .",
     "the report has to be finished by friday ."),
    ("die vögel fliegen im herbst nach süden .",
     "the birds fly south in autumn ."),
    ("er hat die gelegenheit beim schopf gepackt .",
     "he seized the opportunity ."),
    ("mir war nicht klar , wie ernst die lage ist .",
     "i did not realise how serious the situation is ."),
    ("die übung macht den meister .",
     "practice makes perfect ."),
    ("sie begleitete ihn bis zur haustür .",
     "she accompanied him to the front door ."),
    ("das projekt befindet sich noch in der anfangsphase .",
     "the project is still in its initial phase ."),
    ("ich esse abends meistens nur eine kleinigkeit .",
     "i usually eat only a little something in the evening ."),
    ("die entscheidung liegt ganz bei dir .",
     "the decision is entirely up to you ."),
    ("er räumte sein zimmer ohne widerrede auf .",
     "he tidied his room without protest ."),
    ("die sterne leuchteten hell am nachthimmel .",
     "the stars shone brightly in the night sky ."),
    ("ich musste herzlich über seinen witz lachen .",
     "i had to laugh heartily at his joke ."),
    ("die gäste wurden mit einem glas sekt empfangen .",
     "the guests were welcomed with a glass of sparkling wine ."),
    ("er ließ sich von niemandem überzeugen .",
     "he would not let anyone convince him ."),
    ("die erinnerung an jenen tag verblasst langsam .",
     "the memory of that day is slowly fading ."),
    ("wir standen im stau und kamen kaum voran .",
     "we were stuck in a traffic jam and hardly made any progress ."),
    ("sie sang das lied mit geschlossenen augen .",
     "she sang the song with her eyes closed ."),
    ("ich hole dich um sieben uhr ab .",
     "i will pick you up at seven o'clock ."),
    ("das gebäude stammt aus dem achtzehnten jahrhundert .",
     "the building dates from the eighteenth century ."),
    ("er wischte sich den schweiß von der stirn .",
     "he wiped the sweat from his forehead ."),
    ("die lösung lag die ganze zeit vor unseren augen .",
     "the solution was in front of our eyes the whole time ."),
    ("ich nehme mir für das neue jahr viel vor .",
     "i am making a lot of resolutions for the new year ."),
    ("die katze sprang auf die fensterbank .",
     "the cat jumped onto the windowsill ."),
    ("er erzählte die geschichte mit großer begeisterung .",
     "he told the story with great enthusiasm ."),
    ("das medikament muss zweimal täglich eingenommen werden .",
     "the medicine has to be taken twice a day ."),
    ("sie zögerte einen moment , bevor sie antwortete .",
     "she hesitated for a moment before she answered ."),
    ("der wind wehte die blätter über den hof .",
     "the wind blew the leaves across the yard ."),
    ("ich bin fest davon überzeugt , dass wir es schaffen .",
     "i am firmly convinced that we will make it ."),
    ("die bergsteiger brachen früh am morgen auf .",
     "the mountaineers set off early in the morning ."),
    ("er konnte sein glück kaum fassen .",
     "he could hardly believe his luck ."),
    ("die werkstatt ruft an , wenn das auto fertig ist .",
     "the garage will call when the car is ready ."),
    ("ich verbringe meine freizeit am liebsten draußen .",
     "i like spending my free time outdoors best ."),
    ("die debatte wurde hitzig geführt .",
     "the debate was heated ."),
    ("sie vermisst ihre heimat manchmal sehr .",
     "she sometimes misses her home country very much ."),
    ("der koch bereitete das essen frisch zu .",
     "the chef prepared the food fresh ."),
    ("wir einigten uns schließlich auf einen kompromiss .",
     "we finally agreed on a compromise ."),
    ("das internet hat unser leben grundlegend verändert .",
     "the internet has fundamentally changed our lives ."),
    ("er blieb trotz des erfolgs bescheiden .",
     "he remained modest despite his success ."),
    ("die fähre legt zweimal täglich ab .",
     "the ferry departs twice a day ."),
    ("ich habe mir das anders vorgestellt .",
     "i imagined that differently ."),
    ("die nachbarin bringt uns manchmal selbstgemachte marmelade .",
     "our neighbour sometimes brings us homemade jam ."),
    ("er musste sich einer schwierigen operation unterziehen .",
     "he had to undergo a difficult operation ."),
    ("die woche verging wie im flug .",
     "the week flew by ."),
    ("sie bewarb sich um eine stelle im ausland .",
     "she applied for a job abroad ."),
    ("der regen trommelte gegen die fensterscheiben .",
     "the rain drummed against the window panes ."),
    ("ich kann den unterschied kaum erkennen .",
     "i can hardly tell the difference ."),
    ("das team arbeitet an einer neuen lösung .",
     "the team is working on a new solution ."),
    ("die großeltern verwöhnen die enkelkinder gern .",
     "grandparents like spoiling their grandchildren ."),
    ("er gab die hoffnung niemals auf .",
     "he never gave up hope ."),
    ("die vorbereitungen für das fest laufen auf hochtouren .",
     "preparations for the festival are in full swing ."),
    ("ich stimme dir in diesem punkt nicht zu .",
     "i do not agree with you on this point ."),
    ("die sonne brannte heiß vom himmel .",
     "the sun blazed down hot from the sky ."),
    ("er fand den fehler nach langem suchen .",
     "he found the mistake after a long search ."),
    ("die stimmung auf dem fest war ausgelassen .",
     "the mood at the party was exuberant ."),
    ("ich lese vor dem schlafengehen gern ein paar seiten .",
     "i like reading a few pages before going to sleep ."),
    ("die regeln gelten für alle gleichermaßen .",
     "the rules apply equally to everyone ."),
    ("er trat einen schritt zurück und betrachtete das bild .",
     "he stepped back and looked at the picture ."),
    ("das kind versteckte sich hinter dem vorhang .",
     "the child hid behind the curtain ."),
    ("wir verabschiedeten uns am bahnsteig .",
     "we said goodbye on the platform ."),
    ("die idee stieß zunächst auf widerstand .",
     "the idea initially met with resistance ."),
    ("ich habe die adresse auf einen zettel geschrieben .",
     "i wrote the address on a piece of paper ."),
    ("der hund wedelte freudig mit dem schwanz .",
     "the dog wagged its tail happily ."),
    ("sie überlegte lange , was sie schenken sollte .",
     "she thought for a long time about what to give ."),
    ("das gespräch drehte sich hauptsächlich um die arbeit .",
     "the conversation mainly revolved around work ."),
    ("er schloss die augen und genoss die stille .",
     "he closed his eyes and enjoyed the silence ."),
    ("die miete wird nächstes jahr wieder erhöht .",
     "the rent will be raised again next year ."),
    ("ich habe den bus um haaresbreite verpasst .",
     "i missed the bus by a hair's breadth ."),
    ("die folgen des sturms waren noch wochen später sichtbar .",
     "the consequences of the storm were visible weeks later ."),
    ("er nickte zustimmend , sagte aber nichts .",
     "he nodded in agreement but said nothing ."),
    ("die bücher stapeln sich auf meinem schreibtisch .",
     "the books are piling up on my desk ."),
    ("wir fuhren mit der seilbahn auf den berg .",
     "we took the cable car up the mountain ."),
    ("sie wirkte erleichtert , als sie die nachricht hörte .",
     "she seemed relieved when she heard the news ."),
    ("der schlüssel steckt von innen .",
     "the key is in the lock on the inside ."),
    ("ich bin beim joggen vom regen überrascht worden .",
     "i was caught in the rain while jogging ."),
    ("die ausstellung zeigt werke junger künstler .",
     "the exhibition shows works by young artists ."),
    ("er hörte mit dem rauchen von heute auf morgen auf .",
     "he quit smoking overnight ."),
    ("die beiden verstehen sich blendend .",
     "the two get along splendidly ."),
    ("ich habe den verdacht , dass er etwas verheimlicht .",
     "i suspect that he is hiding something ."),
    ("die temperatur stieg auf über dreißig grad .",
     "the temperature rose to over thirty degrees ."),
    ("er packte seine sachen und verließ das haus .",
     "he packed his things and left the house ."),
    ("die musik war bis auf die straße zu hören .",
     "the music could be heard out on the street ."),
    ("ich wünschte , ich hätte mehr zeit für meine hobbys .",
     "i wish i had more time for my hobbies ."),
    ("die fabrik wurde vor zwei jahren geschlossen .",
     "the factory was closed two years ago ."),
    ("er ist seinem vater wie aus dem gesicht geschnitten .",
     "he is the spitting image of his father ."),
    ("die prüfung war leichter , als ich befürchtet hatte .",
     "the exam was easier than i had feared ."),
    ("wir saßen noch lange am lagerfeuer .",
     "we sat by the campfire for a long time ."),
    ("sie brachte das argument auf den punkt .",
     "she summed up the argument precisely ."),
    ("das boot schaukelte sanft auf den wellen .",
     "the boat rocked gently on the waves ."),
    ("ich muss noch schnell etwas erledigen .",
     "i still have to quickly take care of something ."),
    ("die zwillinge sind kaum auseinanderzuhalten .",
     "the twins are hard to tell apart ."),
    ("er warf einen letzten blick auf das meer .",
     "he took one last look at the sea ."),
    ("die heizung funktioniert seit gestern nicht mehr .",
     "the heating has not been working since yesterday ."),
    ("ich freue mich über jede rückmeldung .",
     "i appreciate any feedback ."),
    ("die kirche steht mitten im dorf .",
     "the church stands in the middle of the village ."),
    ("er verdient sein geld als übersetzer .",
     "he earns his money as a translator ."),
    ("die tage werden wieder länger .",
     "the days are getting longer again ."),
    ("ich habe aus versehen das falsche paket geöffnet .",
     "i accidentally opened the wrong parcel ."),
    ("die feuerwehr war innerhalb weniger minuten vor ort .",
     "the fire brigade was on site within a few minutes ."),
    ("er begrüßte jeden gast mit handschlag .",
     "he greeted every guest with a handshake ."),
    ("die landschaft zog am zugfenster vorbei .",
     "the landscape passed by the train window ."),
    ("ich halte es für wahrscheinlich , dass es klappt .",
     "i consider it likely that it will work out ."),
    ("die kinder bauten eine burg aus sand .",
     "the children built a castle out of sand ."),
    ("er brachte den müll hinaus , ohne dass man ihn darum bat .",
     "he took out the rubbish without being asked ."),
    ("die uhr an der wand geht fünf minuten vor .",
     "the clock on the wall is five minutes fast ."),
    ("ich werde den gedanken nicht los , dass wir etwas übersehen .",
     "i cannot shake the thought that we are overlooking something ."),
    ("die sitzplätze waren schon alle besetzt .",
     "all the seats were already taken ."),
    ("er stellte sich der herausforderung ohne zu zögern .",
     "he faced the challenge without hesitation ."),
    ("die suppe köchelte leise auf dem herd .",
     "the soup simmered quietly on the stove ."),
    ("ich habe mir seine worte zu herzen genommen .",
     "i took his words to heart ."),
    ("die alte brücke wird durch eine neue ersetzt .",
     "the old bridge is being replaced by a new one ."),
    ("er sprang über den zaun und rannte davon .",
     "he jumped over the fence and ran away ."),
    ("die geschichte beruht auf wahren begebenheiten .",
     "the story is based on true events ."),
    ("ich bewundere ihren mut , die wahrheit zu sagen .",
     "i admire her courage to tell the truth ."),
    ("die ferien gehen leider viel zu schnell vorbei .",
     "unfortunately the holidays pass far too quickly ."),
    ("er klopfte dreimal an die tür .",
     "he knocked on the door three times ."),
    ("die wäsche trocknet draußen schneller .",
     "the laundry dries faster outside ."),
    ("ich verstehe nur die hälfte von dem , was er sagt .",
     "i understand only half of what he says ."),
    ("die firma stellt dieses jahr zwanzig neue leute ein .",
     "the company is hiring twenty new people this year ."),
    ("er goss die blumen auf dem balkon .",
     "he watered the flowers on the balcony ."),
    ("die kleine wohnung reicht mir völlig .",
     "the small flat is completely sufficient for me ."),
    ("ich bin über das ergebnis sehr erleichtert .",
     "i am very relieved about the result ."),
    ("die diskussion führte zu keinem ergebnis .",
     "the discussion led to no result ."),
    ("er merkte sich jedes detail des gesprächs .",
     "he memorised every detail of the conversation ."),
    ("die rechnung ging nicht auf .",
     "the plan did not work out ."),
    ("ich lasse mich gern überraschen .",
     "i like being surprised ."),
    ("die stadtbibliothek leiht auch filme und spiele aus .",
     "the city library also lends films and games ."),
    ("er überquerte die straße bei grün .",
     "he crossed the street when the light was green ."),
    ("die arbeit am bericht kostet mich viele nerven .",
     "the work on the report is costing me a lot of nerves ."),
    ("ich träume schon lange von einer reise nach japan .",
     "i have long been dreaming of a trip to japan ."),
    ("die blumen auf dem tisch welken schon .",
     "the flowers on the table are already wilting ."),
    ("er gab zu , einen fehler gemacht zu haben .",
     "he admitted to having made a mistake ."),
    ("die straßenbahn hält direkt vor unserem haus .",
     "the tram stops right in front of our house ."),
    ("ich zähle auf deine unterstützung .",
     "i am counting on your support ."),
    ("die verletzung zwang ihn zu einer langen pause .",
     "the injury forced him to take a long break ."),
    ("er las den brief zweimal , um sicherzugehen .",
     "he read the letter twice to make sure ."),
    ("die äpfel aus unserem garten schmecken am besten .",
     "the apples from our garden taste best ."),
    ("ich habe die einladung dankend angenommen .",
     "i gratefully accepted the invitation ."),
    ("die dunkelheit brach früher herein als gedacht .",
     "darkness fell earlier than expected ."),
    ("er hält an seinen gewohnheiten fest .",
     "he sticks to his habits ."),
    ("die reise musste kurzfristig abgesagt werden .",
     "the trip had to be cancelled at short notice ."),
    ("ich orientiere mich in fremden städten leicht .",
     "i find my way around foreign cities easily ."),
    ("die antwort ließ lange auf sich warten .",
     "the answer was a long time coming ."),
    ("er beobachtete die vögel durch das fernglas .",
     "he watched the birds through the binoculars ."),
    ("die sache hat einen haken .",
     "there is a catch to it ."),
    ("ich bin zufällig auf diesen artikel gestoßen .",
     "i came across this article by chance ."),
    ("die gläser klirrten beim anstoßen .",
     "the glasses clinked as we toasted ."),
    ("er fühlte sich in der neuen stadt schnell wohl .",
     "he quickly felt at home in the new city ."),
    ("die termine überschneiden sich leider .",
     "unfortunately the appointments overlap ."),
    ("ich habe das paket gestern zur post gebracht .",
     "i took the parcel to the post office yesterday ."),
    ("die spannung stieg mit jeder minute .",
     "the tension rose with every minute ."),
    ("er entdeckte seine liebe zum kochen erst spät .",
     "he discovered his love of cooking only late ."),
    ("die treppe knarrt bei jedem schritt .",
     "the stairs creak with every step ."),
    ("ich wäge die vor- und nachteile sorgfältig ab .",
     "i am carefully weighing the pros and cons ."),
    ("die gegend ist bekannt für ihren wein .",
     "the region is known for its wine ."),
    ("er schob die entscheidung vor sich her .",
     "he kept putting off the decision ."),
    ("die möbel stammen noch von meinen großeltern .",
     "the furniture still comes from my grandparents ."),
    ("ich nehme das wörterbuch überallhin mit .",
     "i take the dictionary with me everywhere ."),
    ("die grenze verläuft entlang des flusses .",
     "the border runs along the river ."),
    ("er täuschte eine krankheit vor , um zu hause zu bleiben .",
     "he faked an illness in order to stay at home ."),
    ("die mühe hat sich am ende gelohnt .",
     "the effort paid off in the end ."),
    ("ich erkenne die melodie , aber der titel fällt mir nicht ein .",
     "i recognise the melody but the title escapes me ."),
    ("die gäste trafen nach und nach ein .",
     "the guests arrived one after another ."),
    ("er widmete sein leben der forschung .",
     "he dedicated his life to research ."),
    ("die socken liegen in der untersten schublade .",
     "the socks are in the bottom drawer ."),
    ("ich bin anderer meinung als du .",
     "i am of a different opinion than you ."),
    ("die flut erreichte am abend ihren höchststand .",
     "the tide reached its peak in the evening ."),
    ("er brachte das gespräch geschickt auf ein anderes thema .",
     "he skilfully steered the conversation to another topic ."),
    ("die lehrerin lobte die schüler für ihre arbeit .",
     "the teacher praised the students for their work ."),
    ("ich verzichte heute ausnahmsweise auf nachtisch .",
     "i am skipping dessert today as an exception ."),
    ("die maschine muss regelmäßig gewartet werden .",
     "the machine has to be serviced regularly ."),
    ("er rannte so schnell er konnte zum bahnhof .",
     "he ran to the station as fast as he could ."),
    ("die zeit heilt nicht alle wunden .",
     "time does not heal all wounds ."),
    ("ich mache mir um dich keine sorgen .",
     "i am not worried about you ."),
    ("die papiere lagen verstreut auf dem boden .",
     "the papers lay scattered on the floor ."),
    ("er zeigte uns stolz seine briefmarkensammlung .",
     "he proudly showed us his stamp collection ."),
    ("die wirtschaft erholt sich nur langsam von der krise .",
     "the economy is recovering only slowly from the crisis ."),
    ("ich finde , das klingt ziemlich plausibel .",
     "i think that sounds quite plausible ."),
    ("die botschaft des films kam deutlich an .",
     "the message of the film came across clearly ."),
    ("er saß stundenlang reglos am fenster .",
     "he sat motionless at the window for hours ."),
    ("die mieter beschwerten sich über den lärm .",
     "the tenants complained about the noise ."),
    ("ich bin froh , dass du es mir rechtzeitig gesagt hast .",
     "i am glad you told me in time ."),
]

# ---------------------------------------------------------------------------
# Template families: genuine German/English with morphologically safe slots.
# ---------------------------------------------------------------------------

CITIES = ["berlin", "hamburg", "münchen", "köln", "frankfurt", "dresden",
          "leipzig", "stuttgart", "wien", "zürich", "bremen", "hannover"]
CITIES_EN = {"münchen": "munich", "köln": "cologne", "wien": "vienna",
             "zürich": "zurich"}
WEEKDAYS = [("montag", "monday"), ("dienstag", "tuesday"),
            ("mittwoch", "wednesday"), ("donnerstag", "thursday"),
            ("freitag", "friday"), ("samstag", "saturday"),
            ("sonntag", "sunday")]
MONTHS = [("januar", "january"), ("februar", "february"), ("märz", "march"),
          ("april", "april"), ("mai", "may"), ("juni", "june"),
          ("juli", "july"), ("august", "august"), ("september", "september"),
          ("oktober", "october"), ("november", "november"),
          ("dezember", "december")]
PLURAL_FOODS = [("äpfel", "apples"), ("kartoffeln", "potatoes"),
                ("tomaten", "tomatoes"), ("eier", "eggs"),
                ("erdbeeren", "strawberries"), ("zwiebeln", "onions"),
                ("brötchen", "bread rolls"), ("birnen", "pears")]
HOURS = [(str(h), str(h)) for h in (6, 7, 8, 9, 10, 11, 12)]
NUMBERS = [("zwei", "two"), ("drei", "three"), ("vier", "four"),
           ("fünf", "five"), ("sechs", "six"), ("sieben", "seven"),
           ("acht", "eight"), ("neun", "nine"), ("zehn", "ten"),
           ("zwölf", "twelve"), ("zwanzig", "twenty"), ("dreißig", "thirty")]
HOBBIES = [("schwimmen", "swimming"), ("lesen", "reading"),
           ("wandern", "hiking"), ("kochen", "cooking"),
           ("tanzen", "dancing"), ("malen", "painting"),
           ("fotografieren", "photography"), ("segeln", "sailing")]
WEATHER = [("sonnig", "sunny"), ("regnerisch", "rainy"), ("windig", "windy"),
           ("neblig", "foggy"), ("bewölkt", "cloudy"), ("kalt", "cold"),
           ("warm", "warm"), ("stürmisch", "stormy")]
LANGS = [("deutsch", "german"), ("englisch", "english"),
         ("spanisch", "spanish"), ("italienisch", "italian"),
         ("russisch", "russian"), ("japanisch", "japanese")]

# Round-3 lexicons (VERDICT r2 #9: grow the corpus toward the reference's
# IWSLT14 scale, run_machine_translation.py:414).  Slots are full phrases
# with the German morphology baked in (determiner + gender agreement), so
# every expansion stays grammatical.
FAMILY = [("mein bruder", "my brother"), ("meine schwester", "my sister"),
          ("mein onkel", "my uncle"), ("meine tante", "my aunt"),
          ("mein großvater", "my grandfather"),
          ("meine großmutter", "my grandmother"),
          ("mein cousin", "my cousin"), ("meine nachbarin", "my neighbour"),
          ("mein kollege", "my colleague")]
COUNTRIES = [("frankreich", "france"), ("spanien", "spain"),
             ("italien", "italy"), ("polen", "poland"),
             ("schweden", "sweden"), ("norwegen", "norway"),
             ("portugal", "portugal"), ("griechenland", "greece"),
             ("japan", "japan"), ("kanada", "canada")]
# nominative singular with definite article: weak adjective ending is -e
# for every gender, so "{art} {farbe}e {obj}" is always well-formed
COLORS = [("rot", "red"), ("blau", "blue"), ("grün", "green"),
          ("gelb", "yellow"), ("schwarz", "black"), ("weiß", "white"),
          ("braun", "brown"), ("grau", "grey")]
OBJECTS = [("der", "stuhl", "chair"), ("die", "tasche", "bag"),
           ("das", "auto", "car"), ("die", "jacke", "jacket"),
           ("der", "mantel", "coat"), ("das", "fahrrad", "bicycle"),
           ("die", "lampe", "lamp"), ("der", "schrank", "cupboard")]
ROOMS = [("im wohnzimmer", "in the living room"),
         ("in der küche", "in the kitchen"),
         ("im schlafzimmer", "in the bedroom"),
         ("im flur", "in the hallway"), ("im keller", "in the basement"),
         ("auf dem balkon", "on the balcony"), ("im büro", "in the office"),
         ("in der garage", "in the garage")]

# Round-5 lexicons (VERDICT r4 #7: another order of magnitude toward
# IWSLT14's ~160k filtered pairs).  FAMILY_G carries grammatical gender so
# gendered profession nouns stay agreement-correct; FAMILY keeps its old
# shape for the r3 templates.
FAMILY_G = [("mein bruder", "my brother", "m"),
            ("meine schwester", "my sister", "f"),
            ("mein onkel", "my uncle", "m"),
            ("meine tante", "my aunt", "f"),
            ("mein großvater", "my grandfather", "m"),
            ("meine großmutter", "my grandmother", "f"),
            ("mein cousin", "my cousin", "m"),
            ("meine nachbarin", "my neighbour", "f"),
            ("mein kollege", "my colleague", "m")]
# (masculine form, feminine form, english)
PROFESSIONS = [("lehrer", "lehrerin", "teacher"),
               ("arzt", "ärztin", "doctor"),
               ("anwalt", "anwältin", "lawyer"),
               ("ingenieur", "ingenieurin", "engineer"),
               ("koch", "köchin", "cook"),
               ("verkäufer", "verkäuferin", "shop assistant"),
               ("journalist", "journalistin", "journalist"),
               ("übersetzer", "übersetzerin", "translator")]


def _acc(art: str, color_de: str, noun: str) -> str:
    """Accusative singular NP with weak adjective ending: masculine takes
    den + -en, feminine/neuter keep their article + -e."""
    if art == "der":
        return f"den {color_de}en {noun}"
    return f"{art} {color_de}e {noun}"


def _city_en(c: str) -> str:
    return CITIES_EN.get(c, c)


def _expand_templates() -> List[tuple]:
    pairs = []

    for c in CITIES:
        ce = _city_en(c)
        pairs += [
            (f"ich fahre nächste woche nach {c} .",
             f"i am going to {ce} next week ."),
            (f"warst du schon einmal in {c} ?",
             f"have you ever been to {ce} ?"),
            (f"meine schwester wohnt seit zwei jahren in {c} .",
             f"my sister has been living in {ce} for two years ."),
            (f"der zug nach {c} fährt von gleis neun ab .",
             f"the train to {ce} departs from platform nine ."),
            (f"wie weit ist es von hier nach {c} ?",
             f"how far is it from here to {ce} ?"),
        ]
    for (wd, we) in WEEKDAYS:
        pairs += [
            (f"wir treffen uns am {wd} vor dem kino .",
             f"we are meeting on {we} in front of the cinema ."),
            (f"am {wd} habe ich leider keine zeit .",
             f"unfortunately i have no time on {we} ."),
            (f"der kurs findet jeden {wd} statt .",
             f"the course takes place every {we} ."),
        ]
    for (m, me) in MONTHS:
        pairs += [
            (f"im {m} fliegen wir in den urlaub .",
             f"in {me} we are flying off on holiday ."),
            (f"das festival findet im {m} statt .",
             f"the festival takes place in {me} ."),
        ]
    for (f_de, f_en) in PLURAL_FOODS:
        pairs += [
            (f"ich habe auf dem markt frische {f_de} gekauft .",
             f"i bought fresh {f_en} at the market ."),
            (f"wir brauchen noch {f_de} für das abendessen .",
             f"we still need {f_en} for dinner ."),
        ]
    for (h, he) in HOURS:
        pairs += [
            (f"der unterricht beginnt um {h} uhr .",
             f"class starts at {he} o'clock ."),
            (f"ich bin seit {h} uhr wach .",
             f"i have been awake since {he} o'clock ."),
        ]
    for (n, ne) in NUMBERS:
        pairs += [
            (f"das dorf liegt {n} kilometer von der küste entfernt .",
             f"the village is {ne} kilometres from the coast ."),
            (f"die wanderung dauert ungefähr {n} stunden .",
             f"the hike takes about {ne} hours ."),
        ]
    for (hb, he) in HOBBIES:
        pairs += [
            (f"in meiner freizeit gehe ich gern {hb}" + " ."
             if hb in ("schwimmen", "wandern", "tanzen", "segeln")
             else f"ich habe das {hb} als hobby entdeckt .",
             f"in my free time i like to go {he} ."
             if hb in ("schwimmen", "wandern", "tanzen", "segeln")
             else f"i discovered {he} as a hobby ."),
            (f"{hb} macht mir großen spaß .",
             f"{he} is great fun for me ."),
        ]
    for (w, we) in WEATHER:
        pairs += [
            (f"morgen soll es {w} werden .",
             f"tomorrow it is supposed to be {we} ."),
            (f"gestern war es den ganzen tag {w} .",
             f"yesterday it was {we} all day ."),
        ]
    for (l, le) in LANGS:
        pairs += [
            (f"sie lernt seit einem jahr {l} .",
             f"she has been learning {le} for a year ."),
            (f"er spricht {l} fast ohne akzent .",
             f"he speaks {le} almost without an accent ."),
        ]
    # two-slot families: held-out combinations are the generalisation test
    for (wd, we) in WEEKDAYS:
        for c in CITIES:
            pairs.append(
                (f"am {wd} fahre ich mit dem zug nach {c} .",
                 f"on {we} i am taking the train to {_city_en(c)} ."))
    for (n, ne) in NUMBERS:
        for (f_de, f_en) in PLURAL_FOODS:
            pairs.append(
                (f"bitte bring {n} kilo {f_de} vom markt mit .",
                 f"please bring {ne} kilos of {f_en} from the market ."))
    for (h, he) in HOURS:
        for (wd, we) in WEEKDAYS:
            pairs.append(
                (f"der termin am {wd} wurde auf {h} uhr verlegt .",
                 f"the appointment on {we} was moved to {he} o'clock ."))
    for (m, me) in MONTHS:
        for c in CITIES:
            pairs.append(
                (f"im {m} besuchen wir freunde in {c} .",
                 f"in {me} we are visiting friends in {_city_en(c)} ."))

    # ---- round-3 families: push toward IWSLT-ish scale (~10k pairs) ----
    for (f_de, f_en) in FAMILY:
        for c in CITIES:
            pairs.append(
                (f"{f_de} wohnt schon seit vielen jahren in {c} .",
                 f"{f_en} has been living in {_city_en(c)} for many years ."))
        for (hb, he) in HOBBIES:
            # nominalised infinitives are always neuter: "das schwimmen"
            pairs.append(
                (f"{f_de} interessiert sich sehr für das {hb} .",
                 f"{f_en} is very interested in {he} ."))
        for (l, le) in LANGS:
            pairs.append(
                (f"{f_de} lernt seit zwei jahren {l} .",
                 f"{f_en} has been learning {le} for two years ."))
        for (wd, we) in WEEKDAYS:
            pairs.append(
                (f"{f_de} kommt am {wd} zu besuch .",
                 f"{f_en} is coming to visit on {we} ."))
        for (h, he) in HOURS:
            pairs.append(
                (f"{f_de} steht jeden tag um {h} uhr auf .",
                 f"{f_en} gets up at {he} o'clock every day ."))
        for (fo_de, fo_en) in PLURAL_FOODS:
            pairs.append(
                (f"{f_de} isst gern {fo_de} zum frühstück .",
                 f"{f_en} likes eating {fo_en} for breakfast ."))
    for (co, ce) in COUNTRIES:
        pairs += [
            (f"wir planen eine lange reise nach {co} .",
             f"we are planning a long trip to {ce} ."),
            (f"sie ist letztes jahr nach {co} ausgewandert .",
             f"she emigrated to {ce} last year ."),
            (f"aus {co} hat er mir eine postkarte geschickt .",
             f"he sent me a postcard from {ce} ."),
        ]
        for (m, me) in MONTHS:
            pairs.append(
                (f"im {m} fliegen wir nach {co} .",
                 f"in {me} we are flying to {ce} ."))
        for (f_de, f_en) in FAMILY:
            pairs.append(
                (f"{f_de} war noch nie in {co} .",
                 f"{f_en} has never been to {ce} ."))
        for (n, ne) in NUMBERS:
            pairs.append(
                (f"er hat {n} jahre in {co} gelebt .",
                 f"he lived in {ce} for {ne} years ."))
        for (w, we) in WEATHER:
            pairs.append(
                (f"in {co} ist es im winter oft {w} .",
                 f"in {ce} it is often {we} in winter ."))
    for (c_de, c_en) in COLORS:
        for (art, o_de, o_en) in OBJECTS:
            pairs += [
                (f"{art} {c_de}e {o_de} gefällt mir sehr .",
                 f"i really like the {c_en} {o_en} ."),
                (f"{art} {c_de}e {o_de} war ein geschenk von meinen eltern .",
                 f"the {c_en} {o_en} was a present from my parents ."),
            ]
            for (r_de, r_en) in ROOMS:
                pairs.append(
                    (f"{art} {c_de}e {o_de} ist {r_de} .",
                     f"the {c_en} {o_en} is {r_en} ."))
    for c in CITIES:
        ce = _city_en(c)
        for (w, we) in WEATHER:
            pairs.append(
                (f"in {c} war es gestern {w} .",
                 f"in {ce} it was {we} yesterday ."))
        for (h, he) in HOURS:
            pairs.append(
                (f"der bus nach {c} fährt um {h} uhr ab .",
                 f"the bus to {ce} leaves at {he} o'clock ."))
        for (l, le) in LANGS:
            pairs.append(
                (f"in {c} habe ich angefangen , {l} zu lernen .",
                 f"in {ce} i started to learn {le} ."))
    for (wd, we) in WEEKDAYS:
        for (w_de, w_en) in WEATHER:
            pairs.append(
                (f"am {wd} soll es {w_de} werden .",
                 f"on {we} it is supposed to be {w_en} ."))
        for (m, me) in MONTHS:
            pairs.append(
                (f"der erste {wd} im {m} ist ein feiertag .",
                 f"the first {we} in {me} is a public holiday ."))
    for (m, me) in MONTHS:
        for (w_de, w_en) in WEATHER:
            pairs.append(
                (f"im {m} ist es hier oft {w_de} .",
                 f"in {me} it is often {w_en} here ."))
    # three-slot families: the held-out set recombines all three axes
    for (f_de, f_en) in FAMILY:
        for (wd, we) in WEEKDAYS:
            for c in CITIES:
                pairs.append(
                    (f"{f_de} fährt am {wd} nach {c} .",
                     f"{f_en} is going to {_city_en(c)} on {we} ."))
        for (m, me) in MONTHS:
            for (co, ce) in COUNTRIES:
                pairs.append(
                    (f"{f_de} fliegt im {m} nach {co} .",
                     f"{f_en} is flying to {ce} in {me} ."))
        for (hb, he) in HOBBIES:
            for (wd, we) in WEEKDAYS:
                pairs.append(
                    (f"am {wd} hat {f_de} endlich zeit für das {hb} .",
                     f"on {we} {f_en} finally has time for {he} ."))
    for (wd, we) in WEEKDAYS:
        for (n, ne) in NUMBERS:
            for (fo_de, fo_en) in PLURAL_FOODS:
                pairs.append(
                    (f"am {wd} habe ich {n} kilo {fo_de} gekauft .",
                     f"on {we} i bought {ne} kilos of {fo_en} ."))
        for (h, he) in HOURS:
            for c in CITIES:
                pairs.append(
                    (f"am {wd} um {h} uhr treffen wir uns in {c} .",
                     f"on {we} at {he} o'clock we are meeting in "
                     f"{_city_en(c)} ."))
    for (f_de, f_en) in FAMILY:
        for (l, le) in LANGS:
            for (n, ne) in NUMBERS:
                pairs.append(
                    (f"{f_de} lernt seit {n} monaten {l} .",
                     f"{f_en} has been learning {le} for {ne} months ."))

    # ---- round-5 families: ≥30k pairs (within 5x of IWSLT14 filtered) ----
    # new three-slot combinations over the existing lexicons
    for (f_de, f_en, g) in FAMILY_G:
        for (pm, pf, pe) in PROFESSIONS:
            p_de = pm if g == "m" else pf
            pairs.append(
                (f"{f_de} arbeitet schon lange als {p_de} .",
                 f"{f_en} has been working as a {pe} for a long time ."))
            for c in CITIES:
                pairs.append(
                    (f"{f_de} arbeitet als {p_de} in {c} .",
                     f"{f_en} works as a {pe} in {_city_en(c)} ."))
    for (f_de, f_en) in FAMILY:
        for (c_de, c_en) in COLORS:
            for (art, o_de, o_en) in OBJECTS:
                pairs.append(
                    (f"{f_de} hat sich {_acc(art, c_de, o_de)} gekauft .",
                     f"{f_en} bought the {c_en} {o_en} ."))
        for (n, ne) in NUMBERS:
            for c in CITIES:
                pairs.append(
                    (f"{f_de} ist vor {n} jahren nach {c} gezogen .",
                     f"{f_en} moved to {_city_en(c)} {ne} years ago ."))
        for (h, he) in HOURS:
            for (r_de, r_en) in ROOMS:
                pairs.append(
                    (f"um {h} uhr war {f_de} noch {r_de} .",
                     f"at {he} o'clock {f_en} was still {r_en} ."))
        for (co, ce) in COUNTRIES:
            for (l, le) in LANGS:
                pairs.append(
                    (f"{f_de} hat in {co} {l} gelernt .",
                     f"{f_en} learned {le} in {ce} ."))
        for (wd, we) in WEEKDAYS:
            for (fo_de, fo_en) in PLURAL_FOODS:
                pairs.append(
                    (f"am {wd} kauft {f_de} frische {fo_de} .",
                     f"on {we} {f_en} buys fresh {fo_en} ."))
    for (c_de, c_en) in COLORS:
        for (art, o_de, o_en) in OBJECTS:
            for (r_de, r_en) in ROOMS:
                pairs.append(
                    (f"gestern habe ich {_acc(art, c_de, o_de)} {r_de} "
                     f"gefunden .",
                     f"yesterday i found the {c_en} {o_en} {r_en} ."))
    for (m, me) in MONTHS:
        for (co, ce) in COUNTRIES:
            for (w_de, w_en) in WEATHER:
                pairs.append(
                    (f"im {m} ist es in {co} oft {w_de} .",
                     f"in {me} it is often {w_en} in {ce} ."))
        for c in CITIES:
            for (w_de, w_en) in WEATHER:
                pairs.append(
                    (f"im {m} ist es in {c} häufig {w_de} .",
                     f"in {me} it is frequently {w_en} in {_city_en(c)} ."))
    for (wd, we) in WEEKDAYS:
        for c in CITIES:
            for (w_de, w_en) in WEATHER:
                pairs.append(
                    (f"am {wd} war es in {c} {w_de} .",
                     f"on {we} it was {w_en} in {_city_en(c)} ."))
    # four-slot families: the held-out split recombines all four axes
    for (f_de, f_en) in FAMILY:
        for (wd, we) in WEEKDAYS:
            for (h, he) in HOURS:
                for c in CITIES:
                    pairs.append(
                        (f"{f_de} fährt am {wd} um {h} uhr nach {c} .",
                         f"{f_en} is going to {_city_en(c)} at {he} "
                         f"o'clock on {we} ."))
        for (m, me) in MONTHS:
            for (n, ne) in NUMBERS:
                for (co, ce) in COUNTRIES:
                    pairs.append(
                        (f"{f_de} will im {m} für {n} tage nach {co} "
                         f"reisen .",
                         f"{f_en} wants to travel to {ce} for {ne} days "
                         f"in {me} ."))
    for (wd, we) in WEEKDAYS:
        for c in CITIES:
            for (n, ne) in NUMBERS:
                for (fo_de, fo_en) in PLURAL_FOODS:
                    pairs.append(
                        (f"am {wd} habe ich auf dem markt in {c} {n} kilo "
                         f"{fo_de} gekauft .",
                         f"on {we} i bought {ne} kilos of {fo_en} at the "
                         f"market in {_city_en(c)} ."))
    return pairs


def make_fixture_dataset(seed: int = 0) -> List[Dict[str, str]]:
    """All fixture pairs as ``{"de": ..., "en": ...}`` dicts, shuffled
    deterministically (seed) so train/val/test splits mix handwritten and
    template sentences."""
    pairs = HAND_PAIRS + _expand_templates()
    rng = random.Random(seed)
    rng.shuffle(pairs)
    return [{"de": de, "en": en} for (de, en) in pairs]
