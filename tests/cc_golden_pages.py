"""Representative synthetic pages for every Common Crawl scraper spec
— the input half of the byte-exact golden corpus
(tests/golden/cc/*.tsv), mirroring the reference's
tests/resources/example_output strategy for its 15 commoncrawl
scrapers. Each page exercises the site's selector set including at
least one drop path where the scraper has one."""

CC_PAGES: dict[str, list[tuple[str, str]]] = {
    "deviantart": [
        (
            "https://www.deviantart.com/bob/art/123",
            """<html><head>
            <meta property="og:image" content="https://images.da.net/art.jpg">
            <meta property="og:image:width" content="800">
            <meta property="og:image:height" content="600">
            <meta property="og:title" content="My &quot;Art&quot;">
            <meta property="og:url"
                  content="https://www.deviantart.com/bob/art/123">
            </head><body>
            <a rel="license"
               href="https://creativecommons.org/licenses/by-nc-sa/3.0/">CC</a>
            <small class="author">by <a class="u username"
              href="https://bob.deviantart.com">Bob</a></small>
            <div class="text block">A   nice
            piece</div>
            <div class="dev-page-view view-mode-normal"
                 gmi-deviationid="987"></div></body></html>""",
        ),
        (
            "https://www.deviantart.com/none/art/9",
            # no CC anchor → dropped
            '<meta property="og:image" content="https://x/i.png">'
            '<div class="dev-page-view view-mode-normal" '
            'gmi-deviationid="1"></div>',
        ),
    ],
    "animaldiversityweb": [
        (
            "https://animaldiversity.org/accounts/Vulpes_vulpes/",
            """<a rel="license"
             href="https://creativecommons.org/licenses/by-nc-sa/3.0/">C</a>
            <img class="resource" src="/collections/x.jpg" data-width="500"
                 data-height="400" alt="a skull">
            <meta property="og:title" content="Vulpes vulpes">
            <meta property="og:url"
                  content="https://animaldiversity.org/v/1/">
            <section class="metadata">
              <h3>Body Mass</h3><p>5 kg</p>
              <h3>Conditions of Use</h3><p>do not use</p>
            </section>
            <ul class="keywords"><li>mammal::fox</li></ul>
            <ul class="keywords last"><li>carnivore</li></ul>""",
        ),
    ],
    "behance": [
        (
            "https://www.behance.net/gallery/9",
            """<div id="project-block-copyright"><a
              href="https://creativecommons.org/licenses/by-nd/4.0/">c</a>
            </div>
            <meta property="og:title" content="Poster Set">
            <meta property="og:url"
                  content="https://www.behance.net/gallery/9">
            <meta property="og:owners" content="Ana Lima">
            <meta property="og:description" content="posters">
            <a class="object-tag" href="#">print</a>
            <a class="ProjectTags-tagLink-Hh_" href="#">design</a>
            <div id="project-modules">
              <img src="https://mir.behance.net/a.png">
              <img src="https://mir.behance.net/img/site/blank.png">
              <img src="https://mir.behance.net/b.png">
            </div>""",
        ),
    ],
    "capl": [
        (
            "http://capl.washjeff.edu/browseresults.php?img=5&size=m",
            """<div class="singleimage">
              <a rel="license"
               href="https://creativecommons.org/licenses/by-nc-sa/3.0/">c
              </a>
              <span class="alternateImages"><span class="directLink">
                <a href="/images/m/apple.jpg">direct</a></span></span>
              <div class="line"><span lang="de">der Apfel</span></div>
              <div class="line"><span lang="en">the apple</span></div>
            </div>""",
        ),
    ],
    "digitaltmuseum": [
        (
            "https://digitaltmuseum.org/021015722855/boat",
            """<meta property="og:url"
                  content="https://digitaltmuseum.org/a/55">
            <div class="article__title"><h1>Old Boat</h1></div>
            <div class="article__leadtext"><p>A boat.  Expand text</p>
            </div>
            <ul><li class="media__item">
              <a class="media__license license"
                 href="https://creativecommons.org/licenses/by-sa/4.0/">c
              </a>
              <a class="module__media  media--image" href="/media/1"></a>
              <img src="https://dms.dimu.org/image/1?dimension=800x800"
                   alt="boat">
              <i class="media__credit">Fotograf: Nils Olsen</i>
            </li>
            <li class="media__item">
              <img src="https://dms.dimu.org/image/2">
            </li></ul>""",
        ),
    ],
    "eol": [
        (
            "https://eol.org/data_objects/456",
            """<meta name="keywords" content="fish, reef">
            <meta property="og:title" content="Clownfish - EOL">
            <meta property="og:url"
                  content="https://eol.org/data_objects/456">
            <div class="article overview"><div class="copy">Bright fish.
            More text.</div></div>
            <div class="media">
              <a href="https://media.eol.org/content/f.jpg">i</a></div>
            <div class="article source">
              <p title="Rights holder">© Jane Reef</p>
              <a href="https://creativecommons.org/licenses/by-nc/2.0/">l
              </a></div>""",
        ),
    ],
    "floraon": [
        (
            "https://flora-on.pt/#qs",
            """<span class="especie">Quercus Suber</span>
            <div id="fotochooser">
              <div class="thumbnail">
                <a rel="license"
                 href="https://creativecommons.org/licenses/by-nc/4.0/">c
                </a>
                <img class="image" src="fotos/qs1.jpg" alt="bark">
                <input name="wid" value="640"><input name="hei"
                       value="480">
                <input name="aut" value="J. Silva">
              </div>
              <div class="thumbnail">
                <a rel="license" href="https://example.org/no-cc">x</a>
                <img class="image" src="fotos/qs2.jpg">
              </div>
            </div>""",
        ),
    ],
    "geographorguk": [
        (
            "https://www.geograph.org.uk/photo/9",
            """<a rel="license"
             href="https://creativecommons.org/licenses/by-sa/2.0/">c</a>
            <div id="mainphoto"><img
              src="https://s0.geograph.org.uk/p/9.jpg" width="640"
              height="480"></div>
            <strong property="dct:title">Old Bridge</strong>
            <a rel="author" href="/profile/77">Pat Moore</a>
            <span class="tag">bridge</span><span class="tag">river</span>
            <abbr class="latitude" title="51.5"></abbr>
            <abbr class="longitude" title="-0.1"></abbr>
            <span itemprop="exifData">Taken: 2 May 2019</span>
            <div itemprop="description">A stone   bridge.</div>
            <link rel="canonical"
                  href="https://www.geograph.org.uk/photo/9">""",
        ),
    ],
    "iha": [
        (
            "https://www.iha.com/holiday/42",
            """<meta property="og:url" content="https://www.iha.com/h/42">
            <meta name="keywords" content="villa, pool">
            <div class="ph">
              <span class="swiper-slide"
                    about="https://img.iha.com/4200/1.jpeg">
                <a rel="license"
                 href="https://creativecommons.org/licenses/by-nd/3.0/">c
                </a>
                <img src="https://img.iha.com/s/4200/1.jpeg" alt="front"
                     width="300" height="200" title="Villa front">
              </span>
              <span class="swiper-slide">
                <img src="https://img.iha.com/s/4200/2.jpeg">
              </span>
            </div>""",
        ),
    ],
    "mccordmuseum": [
        (
            "http://www.mccord-museum.qc.ca/en/collection/artifacts/M990",
            """<a rel="license"
             href="https://creativecommons.org/licenses/by-nc-nd/2.5/">c
            </a>
            <div class="image"><img src="/ObjView/m990.jpg" width="531.0"
                 height="768" alt="portrait"></div>
            <h1 class="vo">M990.772.1 | Winter Scene</h1>
            <a title="All tagged images" href="#">painting</a>
            <div id="etiquette">
              <a href="search.php?tablename=artist&id=3">James Duncan
              (1806-1881)</a></div>
            <div id="descriptions">Oil on canvas.</div>""",
        ),
    ],
    "museumvictoria": [
        (
            "https://collections.museumvictoria.com.au/items/12345",
            """<span class="licence"><a
              href="https://creativecommons.org/licenses/by/4.0/">CC</a>
            </span>
            <meta property="og:image"
                  content="https://mv.imgs/items/5-medium.jpg">
            <meta property="og:image:width" content="1200">
            <meta property="og:image:height" content="900">
            <meta property="og:title" content="Brass Telescope">
            <div class="creators">Photographer: Lee Wong</div>
            <div class="summary"><p>A telescope.</p></div>""",
        ),
    ],
    "sciencemuseum": [
        (
            "https://collection.sciencemuseum.org.uk/objects/co8",
            """<div class="cite__method"><img
              src="https://sm.cdn/badges/cc-by-nc-sa.svg"></div>
            <meta property="og:url"
                  content="https://collection.smg.uk/obj/8">
            <meta property="og:title" content="Difference Engine">
            <meta property="og:description"
                  content="A calculating machine">
            <dl class="record-top__dl fact-maker"><dt>Maker</dt>
              <dd><a href="/people/cp1">Charles Babbage</a></dd></dl>
            <img class="carousel__image" src="https://sm.cdn/i/1.jpg">
            <img class="carousel__image"
                 data-flickity-lazyload="https://sm.cdn/i/2.jpg">""",
        ),
    ],
    "svgsilh": [
        (
            "https://svgsilh.com/tag/cat.html",
            """<meta property="og:image"
                  content="https://svgsilh.com/png/1-x.png">
            <meta property="og:description"
                  content="Cat Silhouette - Free (svg)">
            <div class="card mb-3 box-shadow h-100">
              <a rel="license"
               href="https://creativecommons.org/publicdomain/zero/1.0/">z
              </a>
              <a href="/image/11.html"><img src="/svg/11.svg"></a>
              <p property="dct:title"><a>cat</a> <a>animal</a></p>
            </div>
            <div class="card mb-3 box-shadow h-100">
              <a rel="license"
                 href="https://creativecommons.org/licenses/by/2.0/">b</a>
              <a href="/image/12.html"><img src="/svg/12.svg"></a>
            </div>""",
        ),
    ],
    "thorvaldsensmuseum": [
        (
            "https://tm.dk/work/a123",
            """<a rel="license"
               href="https://creativecommons.org/publicdomain/zero/1.0/"
               about="https://tm.dk/media/large/a123.jpg">cc0</a>
            <img src="https://tm.dk/media/large/a123.jpg" width="900"
                 height="700" alt="Jason with the Golden Fleece">
            <img src="https://tm.dk/other.jpg" width="10" height="10"
                 alt="no">
            <div class="artists">Bertel Thorvaldsen
              <a class="standard" href="/people/bt">profile</a></div>""",
        ),
    ],
    "worms": [
        (
            "http://www.marinespecies.org/photogallery.php?p=image&pic=31459",
            """<div id="photogallery_share"
             data-url="http://www.marinespecies.org/photogallery.php?p=image&pic=31459">
            </div>
            <div id="photogallery_resized_img">
              <meta itemprop="license"
               content="https://creativecommons.org/licenses/by-nc-sa/4.0/">
              <img src="http://wrm.org/resized/31459.jpg" width="800"
                   height="533" title="Amphipod specimen">
            </div>
            <span class="photogallery_caption photogallery_descr"><span
              class="photogallery_caption photogallery_text">Deep sea.
            </span></span>
            <span class="photogallery_caption photogallery_author"><a
              href="/aphia.php?id=9">A. Researcher</a></span>""",
        ),
    ],
}
