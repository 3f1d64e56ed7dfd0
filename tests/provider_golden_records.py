"""Representative API records per provider spec, shared by the golden
generator (tools/gen_provider_goldens.py) and the byte-level golden
tests (tests/test_provider_goldens.py).

One or more records per provider, chosen to exercise the spec's
distinctive mapping logic (license maps, size preference chains,
multi-image explode, record filters) — the engine-side analog of the
reference's tests/resources/example_output/*.tsv corpus.
"""

from __future__ import annotations

PROVIDER_RECORDS: dict[str, list[dict]] = {
    "flickr": [
        {
            "id": "14962725130",
            "owner": "48600109821",
            "title": 'A  "test"  photo',
            "license": "4",
            "tags": "bird  nature bird zoo",
            "url_l": None,
            "url_m": "https://live.staticflickr.com/3921/m.jpg",
            "url_s": "https://live.staticflickr.com/3921/s.jpg",
            "width_l": None,
            "width_m": 800,
            "width_s": 240,
            "height_l": None,
            "height_m": 600,
            "height_s": 180,
            "views": "2100",
        },
        {
            "id": "99",
            "owner": "u9",
            "title": "cc0 shot",
            "license": "9",
            "tags": "sky",
            "url_l": "https://live.staticflickr.com/1/l.jpg",
            "url_m": None,
            "url_s": None,
            "width_l": 2048,
            "width_m": None,
            "width_s": None,
            "height_l": 1024,
            "height_m": None,
            "height_s": None,
            "views": "7",
        },
    ],
    "smithsonian": [
        {
            "id": "edanmdm-1",
            "title": "Artifact",
            "unit_code": "NMNH",
            "landing_url": "https://si.edu/object/1",
            "image_url": "https://ids.si.edu/1.jpg",
            "media_type": "Images",
            "access": "CC0",
            "creators": [
                {"label": "Author", "content": "Writer W"},
                {"label": "Artist", "content": "Painter A"},
                {"label": "artist/maker", "content": "Painter B"},
                {"label": "Artist", "content": "Unknown person"},
                {"label": "irrelevant", "content": "Nobody"},
            ],
        },
    ],
    "wikimedia": [
        {
            "pageid": "81754323",
            "title": "File:Example.jpg",
            "mediatype": "BITMAP",
            "url": "https://upload.wikimedia.org/a.jpg",
            "descriptionurl":
                "https://commons.wikimedia.org/wiki/File:Example.jpg",
            "width": 1024,
            "height": 768,
            "license_url": "https://creativecommons.org/licenses/by-sa/4.0/",
            "artist": "Some  Artist",
            "global_usage_count": 3,
        },
    ],
    "europeana": [
        {
            "id": "/x/1",
            "rights": ["http://rightsstatements.org/no",
                       "https://creativecommons.org/licenses/by/4.0/"],
            "edmIsShownBy": ["https://img/1.jpg"],
            "edmIsShownAt": ["https://landing/1"],
            "guid": "https://europeana.eu/item/1",
            "edmPreview": ["https://thumb/1.jpg"],
            "title": ["T1", "T1-alt"],
            "country": ["Spain"],
            "dataProvider": ["Wellcome Collection"],
            "dcDescriptionLangAware": {"def": ["  desc-def  "]},
            "dcDescription": ["plain"],
        },
        {
            "id": "/x/2",
            "rights": ["https://creativecommons.org/publicdomain/zero/1.0/"],
            "edmIsShownBy": ["https://img/2.jpg"],
            "guid": "https://europeana.eu/item/2",
            "edmPreview": ["https://thumb/2.jpg"],
            "title": ["T2"],
            "dataProvider": ["Someone"],
            "dcDescription": ["plain2"],
        },
    ],
    "clevelandmuseum": [
        {
            "id": "1", "url": "https://cma/1",
            "share_license_status": "CC0",
            "title": "T", "creation_date": "1900",
            "culture": ["a", None, "b"],
            "creators": [{"description": "artist A"}],
            "images": {
                "web": {"url": "https://img/web.jpg", "width": 10,
                        "height": 11},
                "print": {"url": "https://img/print.jpg", "width": 20,
                          "height": 21},
            },
        },
        {
            "id": "2", "url": "https://cma/2",
            "share_license_status": "CC0",
            "title": "T2", "creation_date": "1901",
            "culture": [],
            "creators": [],
            "images": {
                "print": {"url": "https://img/p2.jpg", "width": 5,
                          "height": 6},
            },
        },
    ],
    "metmuseum": [
        {
            "objectID": "45734", "isPublicDomain": True,
            "primaryImage": "https://images.met/DP123456.jpg",
            "primaryImageSmall": "https://images.met/web/DP123456.jpg",
            "additionalImages": ["https://images.met/DP123457.v2.jpg"],
            "objectURL":
                "https://www.metmuseum.org/art/collection/search/45734",
            "artistDisplayName": "Kiyohara Yukinobu",
            "title": "Quail and Millet",
        },
    ],
    "brooklynmuseum": [
        {
            "id": "10", "title": "B",
            "rights_type": {"description": (
                '<a href="https://creativecommons.org/licenses/by/3.0/">'
                "CC</a>"
            )},
            "artists": [{"name": "minor", "rank": 2},
                        {"name": "primary artist", "rank": 1}],
            "images": [
                {"id": "i1",
                 "largest_derivative_url": "d1.brooklyn.org/x.jpg",
                 "thumbnail_url": "https://thumb/x.jpg",
                 "largest_derivative": "large",
                 "derivatives": [
                     {"size": "small", "height": 1, "width": 2},
                     {"size": "large", "height": 30, "width": 40}]},
                {"id": "i2", "largest_derivative_url": None},
            ],
        },
    ],
    "nypl": [
        {
            "uuid": "u1",
            "mods": {
                "titleInfo": [{"title": {"$": "The Title"}}],
                "name": [
                    {"usage": "secondary", "namePart": {"$": "nope"}},
                    {"usage": "primary", "namePart": {"$": "Creator P"}}],
                "genre": {"$": "Postcards"},
                "typeOfResource": [{"usage": "primary", "$": "still image"}],
                "originInfo": {"dateIssued": {"$": "1900"},
                               "publisher": {"$": "Pub"}},
            },
            "sibling_captures": {"capture": [
                {
                    "imageID": {"$": "img-1"},
                    "itemLink":
                        {"$": "https://digitalcollections.nypl.org/items/1"},
                    "rightsStatementURI": {
                        "$": "https://creativecommons.org/publicdomain/"
                             "zero/1.0/"},
                    "imageLinks": {"imageLink": [
                        {"$": "https://images.nypl.org/index.php?id=1&t=w"
                              "&download=1"},
                        {"$": "https://images.nypl.org/index.php?id=1&t=g"},
                    ]},
                },
                {"imageID": {"$": None}},
            ]},
        },
    ],
    "rawpixel": [
        {
            "id": 123, "freecc0": True,
            "url": "https://www.rawpixel.com/image/123",
            "image_opengraph":
                "https://img.rawpixel.com/x.jpg?w=1200&h=800&dpr=1",
            "image_400": "https://img.rawpixel.com/x-400.jpg",
            "image_title": "Title R",
            "artist_names": "Alice (Source)",
            "pinterest_description": "desc",
            "keywords_raw": "cc0, flower , creative commons,tree",
        },
    ],
    "sciencemuseum": [
        {
            "id": "ob1",
            "links": {"self": "https://collection.smg/objects/ob1"},
            "attributes": {
                "summary_title": "Engine",
                "identifier": [{"value": "A-1"}],
                "name": [{"value": "steam engine"}],
                "categories": [{"value": "Engines"}],
                "legal": {"credit_line": "Gift"},
                "description": [{"value": "big"}],
                "lifecycle": {"creation": [
                    {"maker": [{"summary_title": "Watt"}]}]},
                "multimedia": [
                    {
                        "admin": {"uid": "m1"},
                        "processed": {
                            "large": {
                                "location": "ab/cd/large.jpg",
                                "measurements": {"dimensions": [
                                    {"dimension": "height", "value": 100},
                                    {"dimension": "width", "value": 200}]}},
                            "medium_thumbnail":
                                {"location": "https://cdn/th.jpg"},
                        },
                        "source": {"legal": {"rights": [
                            {"usage_terms": "CC-BY-NC-SA 4.0"}]}},
                    },
                ],
            },
        },
    ],
    "statensmuseum": [
        {
            "object_number": "KKSgb6458",
            "rights": "https://creativecommons.org/publicdomain/zero/1.0/",
            "created": "1920-01-01",
            "collection": ["Danish"], "techniques": ["pen"],
            "colors": ["#aaa"],
            "production": [{"creator": "C. Købke"}],
            "titles": [{"title": "Tegning"}],
            "image_iiif_id": "https://iip.smk.dk/iiif/jp2/a.jp2",
            "image_height": 10, "image_width": 20,
            "alternative_images": [
                {"iiif_id": "https://iip.smk.dk/iiif/jp2/b.jp2",
                 "height": 30, "width": 40},
            ],
        },
    ],
    "thingiverse": [
        {
            "id": "2823006",
            "license": "Creative Commons - Public Domain Dedication",
            "description": "a thing", "name": "Air Spinner",
            "public_url": "https://www.thingiverse.com/thing:2823006",
            "creator": {"first_name": "Walter", "last_name": "Hsiao",
                        "name": "walter",
                        "public_url": "https://www.thingiverse.com/walter"},
            "tags": [{"name": " air "}, {"name": "Demo"}],
            "files": [
                {"default_image": {
                    "id": 7789139,
                    "url": "https://cdn.thing/assets/model.stl",
                    "sizes": [
                        {"type": "display", "size": "medium",
                         "url": "https://cdn.thing/m.jpg"},
                        {"type": "display", "size": "large",
                         "url": "https://cdn.thing/l.jpg"},
                        {"type": "preview", "size": "large",
                         "url": "https://cdn.thing/skip.jpg"},
                    ]}},
                {"default_image": None},
            ],
        },
    ],
    "waltersartmuseum": [
        {
            "ObjectNumber": "W.585",
            "ResourceURL": "https://art.thewalters.org/x",
            "PrimaryImage": {"Raw": "https://img/raw.jpg",
                             "Small": "https://img/small.jpg"},
            "Creator": "Master", "Title": "T",
            "PublicAccessDate": "2015", "Collection": "Manuscripts",
            "Medium": "ink", "Classification": "ms", "Description": None,
            "CreditLine": "gift",
        },
    ],
    "phylopic": [
        {
            "uid": "u-1",
            "licenseURL": "http://creativecommons.org/licenses/by/3.0/",
            "credit": " A. Artist ", "submitted": "2012-01-01",
            "submitter": {"firstName": "Ann", "lastName": "Artist"},
            "taxa": [{"canonicalName": {"string": "Canis lupus"}},
                     {"canonicalName": None}],
            "pngFiles": [
                {"width": 256, "height": 128, "url": "/png/256.png"},
                {"width": 1024, "height": 512, "url": "/png/1024.png"},
                {"width": 512, "height": 256, "url": "/png/512.png"},
            ],
        },
    ],
    "museumsvictoria": [
        {
            "id": "items/123", "displayTitle": "Rock",
            "dateModified": "2020", "category": "geology",
            "physicalDescription": "a rock",
            "keywords": ["k1", "k2"], "classifications": ["c1"],
            "media": [
                {"type": "image", "id": "media/1",
                 "creators": ["ph1", "ph2"],
                 "licence": {"uri":
                             "https://creativecommons.org/licenses/by/4.0"},
                 "thumbnail": {"uri": "https://th/1.jpg"},
                 "medium": {"uri": "https://img/m.jpg", "height": 50,
                            "width": 60}},
                {"type": "video", "id": "media/2",
                 "licence": {"uri":
                             "https://creativecommons.org/licenses/by/4.0"}},
            ],
        },
    ],
    "finnishmuseums": [
        {
            "id": "musketti.M012:HK19670603:74",
            "title": "Talvikuva",
            "imageRights":
                {"link": "http://creativecommons.org/licenses/by/4.0/"},
            "buildings": [{"value": "0/Museovirasto/"}],
            "images": ["/Cover/Show?id=1", "/Cover/Show?id=2"],
            "subjects": [["a", "b"], ["c"]],
        },
    ],
}
