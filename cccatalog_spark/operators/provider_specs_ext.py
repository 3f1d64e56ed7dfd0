"""The remaining provider-mapping specs — full parity with the
reference's provider_api_scripts/ inventory.

Each spec re-expresses one imperative per-record script (150-480 LoC of
fetch-loop Python in the reference) as a declarative column mapping over
the parsed record struct; the fetch/pagination half stays ingestion-side
by design (SURVEY §4.3.4). Multi-image providers use ProviderSpec.images
(engine-side explode of the scripts' inner `for img in images:` loops).

Reference files cited per spec. All expressions are pure Column algebra:
one narrow pass per provider, no UDFs, no shuffles before the shared
normalize stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cccatalog_spark.functions.licenses import license_from_path
from cccatalog_spark.operators.provider_specs import (
    ProviderSpec,
    flickr_spec,
    smithsonian_spec,
    wikimedia_spec,
)

_S = lambda v: F.lit(v)  # noqa: E731


def _jmap(*pairs: tuple[str, Column]) -> Column:
    """Ordered JSON object with null values stripped (the scripts'
    ``{k: v for k, v in ... if v is not None}`` + json.dumps)."""
    return F.to_json(
        F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k, _ in pairs]),
                F.array(*[v.cast("string") for _, v in pairs]),
            ),
            lambda k, v: v.isNotNull(),
        )
    )


def _first(arr: Column) -> Column:
    # F.get, not element_at: null (never an ANSI error) on empty arrays
    return F.get(arr, 0)


# ---------------------------------------------------------------------------
# europeana (europeana.py:169-241)
# ---------------------------------------------------------------------------

EUROPEANA_RECORD = (
    "id string, rights array<string>, edmIsShownBy array<string>, "
    "edmIsShownAt array<string>, guid string, edmPreview array<string>, "
    "title array<string>, country array<string>, dataProvider array<string>, "
    "dcDescriptionLangAware struct<en array<string>, def array<string>>, "
    "dcDescription array<string>"
)

# europeana.py:33 / provider_details.py:59-61 — sub-providers selected by
# dataProvider membership (J4)
EUROPEANA_SUB_PROVIDERS = {"wellcome_collection": "Wellcome Collection"}


def _europeana_license(r: Column) -> Column:
    """First rights URL containing 'creativecommons'
    (europeana.py:200-206)."""
    return _first(F.filter(r["rights"], lambda u: u.contains("creativecommons")))


def _europeana_description(r: Column) -> Column:
    """en → def → dcDescription → '' (europeana.py:229-241)."""
    la = r["dcDescriptionLangAware"]
    return F.trim(
        F.coalesce(
            _first(la["en"]), _first(la["def"]), _first(r["dcDescription"]),
            _S(""),
        )
    )


def europeana_spec() -> ProviderSpec:
    def lic(part: str):
        return lambda r: license_from_path(_europeana_license(r))[part]

    source = lambda r: F.coalesce(  # noqa: E731
        *[
            F.when(F.array_contains(r["dataProvider"], name), _S(sub))
            for sub, name in EUROPEANA_SUB_PROVIDERS.items()
        ],
        _S("europeana"),
    )
    return ProviderSpec(
        provider="europeana",
        record_schema=EUROPEANA_RECORD,
        columns={
            "foreign_identifier": lambda r: r["id"],
            "foreign_landing_url": lambda r: F.coalesce(
                _first(r["edmIsShownAt"]), r["guid"]
            ),
            "url": lambda r: _first(r["edmIsShownBy"]),
            "thumbnail": lambda r: _first(r["edmPreview"]),
            "license": lic("license"),
            "license_version": lic("license_version"),
            "title": lambda r: _first(r["title"]),
            # meta_data carries ARRAY values (country, dataProvider) — a
            # JSON object, not a flat string map (europeana.py:217-227)
            "meta_data": lambda r: F.to_json(
                F.struct(
                    r["country"].alias("country"),
                    r["dataProvider"].alias("dataProvider"),
                    _europeana_description(r).alias("description"),
                )
            ),
            "source": source,
        },
    )


# ---------------------------------------------------------------------------
# cleveland museum of art (cleveland_museum_of_art.py:92-172)
# ---------------------------------------------------------------------------

_CLEV_IMG = "struct<url string, width int, height int>"
CLEVELAND_RECORD = (
    "id string, url string, share_license_status string, title string, "
    "creation_date string, technique string, accession_number string, "
    "creditline string, type string, tombstone string, "
    "culture array<string>, creators array<struct<description string>>, "
    f"images struct<web {_CLEV_IMG}, print {_CLEV_IMG}, full {_CLEV_IMG}>"
)


def _cleveland_pick(r: Column) -> Column:
    """web → print → full size preference (cleveland:138-156)."""
    im = r["images"]
    return F.coalesce(
        F.when(im["web"]["url"].isNotNull(), im["web"]),
        F.when(im["print"]["url"].isNotNull(), im["print"]),
        F.when(im["full"]["url"].isNotNull(), im["full"]),
    )


def cleveland_spec() -> ProviderSpec:
    return ProviderSpec(
        provider="clevelandmuseum",
        record_schema=CLEVELAND_RECORD,
        record_filter=lambda r: F.lower(
            F.coalesce(r["share_license_status"], _S(""))
        )
        == "cc0",
        columns={
            "foreign_identifier": lambda r: r["id"],
            "foreign_landing_url": lambda r: r["url"],
            "url": lambda r: _cleveland_pick(r)["url"],
            "width": lambda r: _cleveland_pick(r)["width"],
            "height": lambda r: _cleveland_pick(r)["height"],
            "license": lambda r: _S("cc0"),
            "license_version": lambda r: _S("1.0"),
            "title": lambda r: r["title"],
            "creator": lambda r: F.coalesce(
                _first(r["creators"])["description"], _S("")
            ),
            # '' defaults are KEPT (cleveland:159-172 uses .get(x, ''))
            "meta_data": lambda r: _jmap(
                ("accession_number", F.coalesce(r["accession_number"], _S(""))),
                ("technique", F.coalesce(r["technique"], _S(""))),
                ("date", F.coalesce(r["creation_date"], _S(""))),
                ("credit_line", F.coalesce(r["creditline"], _S(""))),
                ("classification", F.coalesce(r["type"], _S(""))),
                ("tombstone", F.coalesce(r["tombstone"], _S(""))),
                (
                    "culture",
                    F.array_join(
                        F.filter(
                            F.coalesce(r["culture"], F.array()),
                            lambda x: x.isNotNull(),
                        ),
                        ",",
                    ),
                ),
            ),
        },
    )


# ---------------------------------------------------------------------------
# metropolitan museum of art (metropolitan_museum_of_art.py:85-146)
# ---------------------------------------------------------------------------

MET_RECORD = (
    "objectID string, isPublicDomain boolean, primaryImage string, "
    "primaryImageSmall string, additionalImages array<string>, "
    "objectURL string, artistDisplayName string, title string, "
    "accessionNumber string, classification string, culture string, "
    "objectDate string, medium string, creditLine string"
)


def _met_basename(url: Column) -> Column:
    """url.split('/')[-1].split('.')[0] (metropolitan:131-133)."""
    return _first(F.split(F.element_at(F.split(url, "/"), -1), r"\."))


def met_spec() -> ProviderSpec:
    return ProviderSpec(
        provider="metmuseum",
        record_schema=MET_RECORD,
        record_filter=lambda r: r["isPublicDomain"]
        & r["primaryImage"].isNotNull(),
        # main image (with thumbnail) + additional images (metropolitan:99-103)
        images=lambda r: F.concat(
            F.array(
                F.struct(
                    r["primaryImage"].alias("url"),
                    r["primaryImageSmall"].alias("thumb"),
                )
            ),
            F.transform(
                F.coalesce(r["additionalImages"], F.array()),
                lambda u: F.struct(
                    u.alias("url"), F.lit(None).cast("string").alias("thumb")
                ),
            ),
        ),
        columns={
            "foreign_identifier": lambda r: F.concat(
                r["rec"]["objectID"], _S("-"), _met_basename(r["img"]["url"])
            ),
            "foreign_landing_url": lambda r: r["rec"]["objectURL"],
            "url": lambda r: r["img"]["url"],
            "thumbnail": lambda r: r["img"]["thumb"],
            "license": lambda r: _S("cc0"),
            "license_version": lambda r: _S("1.0"),
            "creator": lambda r: r["rec"]["artistDisplayName"],
            "title": lambda r: r["rec"]["title"],
            "meta_data": lambda r: _jmap(
                ("accession_number", r["rec"]["accessionNumber"]),
                ("classification", r["rec"]["classification"]),
                ("culture", r["rec"]["culture"]),
                ("date", r["rec"]["objectDate"]),
                ("medium", r["rec"]["medium"]),
                ("credit_line", r["rec"]["creditLine"]),
            ),
        },
    )


# ---------------------------------------------------------------------------
# brooklyn museum (brooklyn_museum.py:92-204)
# ---------------------------------------------------------------------------

BROOKLYN_RECORD = (
    "id string, title string, accession_number string, object_date string, "
    "description string, medium string, credit_line string, "
    "classification string, rights_type struct<description string>, "
    "artists array<struct<name string, rank int>>, "
    "images array<struct<id string, largest_derivative_url string, "
    "thumbnail_url string, largest_derivative string, "
    "derivatives array<struct<size string, height int, width int>>>>"
)


def _brooklyn_cc_links(r: Column) -> Column:
    """CC links inside the rights HTML blob (brooklyn:154-166) —
    regexp over the markup replaces lxml link iteration."""
    return F.array_distinct(
        F.regexp_extract_all(
            F.coalesce(r["rights_type"]["description"], _S("")),
            F.lit(r'(https://creativecommons\.org/[^"\'<>\s]+)'),
            1,
        )
    )


def _brooklyn_http(url: Column) -> Column:
    """'https://' prefix when scheme missing (brooklyn:195-204)."""
    return F.when(
        url.isNull() | (url == ""), F.lit(None).cast("string")
    ).otherwise(
        F.when(url.contains("http"), url).otherwise(F.concat(_S("https://"), url))
    )


def _brooklyn_size(r: Column, field: str) -> Column:
    """height/width of the 'largest_derivative'-labelled size
    (brooklyn:142-151)."""
    img = r["img"]
    match = F.filter(
        F.coalesce(img["derivatives"], F.array()),
        lambda s: s["size"] == img["largest_derivative"],
    )
    return _first(match)[field]


def brooklyn_spec() -> ProviderSpec:
    def lic(part: str):
        return lambda r: license_from_path(
            _first(_brooklyn_cc_links(F.struct(r["rec"].alias("x"))["x"]))
        )[part]

    return ProviderSpec(
        provider="brooklynmuseum",
        record_schema=BROOKLYN_RECORD,
        # exactly one distinct CC link or the object is dropped
        record_filter=lambda r: F.size(_brooklyn_cc_links(r)) == 1,
        images=lambda r: F.filter(
            F.coalesce(r["images"], F.array()),
            lambda i: i["largest_derivative_url"].isNotNull()
            & (i["largest_derivative_url"] != ""),
        ),
        columns={
            "foreign_identifier": lambda r: r["img"]["id"],
            "foreign_landing_url": lambda r: F.concat(
                _S("https://www.brooklynmuseum.org/opencollection/objects/"),
                r["rec"]["id"],
            ),
            "url": lambda r: _brooklyn_http(r["img"]["largest_derivative_url"]),
            "thumbnail": lambda r: _brooklyn_http(r["img"]["thumbnail_url"]),
            "width": lambda r: _brooklyn_size(r, "width"),
            "height": lambda r: _brooklyn_size(r, "height"),
            "license": lic("license"),
            "license_version": lic("license_version"),
            "title": lambda r: r["rec"]["title"],
            # first rank-1 artist (brooklyn:179-192)
            "creator": lambda r: _first(
                F.filter(
                    F.coalesce(r["rec"]["artists"], F.array()),
                    lambda a: a["rank"] == 1,
                )
            )["name"],
            "meta_data": lambda r: _jmap(
                ("accession_number", r["rec"]["accession_number"]),
                ("date", r["rec"]["object_date"]),
                ("description", r["rec"]["description"]),
                ("medium", r["rec"]["medium"]),
                ("credit_line", r["rec"]["credit_line"]),
                ("classification", r["rec"]["classification"]),
            ),
        },
    )


# ---------------------------------------------------------------------------
# nypl (nypl.py:104-244)
# ---------------------------------------------------------------------------

_NYPL_D = "struct<`$` string>"
NYPL_RECORD = (
    f"uuid string, mods struct<titleInfo array<struct<title {_NYPL_D}>>, "
    f"name array<struct<usage string, namePart {_NYPL_D}>>, "
    f"genre {_NYPL_D}, "
    f"typeOfResource array<struct<usage string, `$` string>>, "
    f"originInfo struct<dateIssued {_NYPL_D}, publisher {_NYPL_D}>>, "
    "sibling_captures struct<capture array<struct<"
    f"imageID {_NYPL_D}, itemLink {_NYPL_D}, rightsStatementURI {_NYPL_D}, "
    f"imageLinks struct<imageLink array<{_NYPL_D}>>>>>"
)

NYPL_IMAGE_URL_DIMENSIONS = ["g", "v", "q", "w", "r"]
NYPL_THUMBNAIL_DIMENSIONS = ["w", "r", "q", "f", "v", "g"]


def _nypl_preferred(links: Column, dims: list[str]) -> Column:
    """First link whose ?t= type matches the dimension preference list,
    '&download=1' stripped (nypl:191-217)."""
    return F.coalesce(
        *[
            F.regexp_replace(
                _first(
                    F.filter(
                        F.coalesce(links, F.array()),
                        lambda l: F.regexp_extract(
                            l["$"], r"[?&]t=([^&]+)", 1
                        )
                        == d,
                    )
                )["$"],
                r"&download=1",
                "",
            )
            for d in dims
        ]
    )


def nypl_spec() -> ProviderSpec:
    def lic(part: str):
        return lambda r: license_from_path(
            r["img"]["rightsStatementURI"]["$"]
        )[part]

    return ProviderSpec(
        provider="nypl",
        record_schema=NYPL_RECORD,
        # captures with image id + landing + rights + resolvable image
        # url survive (nypl:135-154)
        images=lambda r: F.filter(
            F.coalesce(r["sibling_captures"]["capture"], F.array()),
            lambda c: c["imageID"]["$"].isNotNull()
            & c["itemLink"]["$"].isNotNull()
            & c["rightsStatementURI"]["$"].isNotNull()
            & _nypl_preferred(
                c["imageLinks"]["imageLink"], NYPL_IMAGE_URL_DIMENSIONS
            ).isNotNull(),
        ),
        columns={
            "foreign_identifier": lambda r: r["img"]["imageID"]["$"],
            "foreign_landing_url": lambda r: r["img"]["itemLink"]["$"],
            "url": lambda r: _nypl_preferred(
                r["img"]["imageLinks"]["imageLink"], NYPL_IMAGE_URL_DIMENSIONS
            ),
            "thumbnail": lambda r: _nypl_preferred(
                r["img"]["imageLinks"]["imageLink"], NYPL_THUMBNAIL_DIMENSIONS
            ),
            "license": lic("license"),
            "license_version": lic("license_version"),
            "title": lambda r: _first(r["rec"]["mods"]["titleInfo"])["title"][
                "$"
            ],
            # first usage=primary creator (nypl:175-188)
            "creator": lambda r: _first(
                F.filter(
                    F.coalesce(r["rec"]["mods"]["name"], F.array()),
                    lambda i: i["usage"] == "primary",
                )
            )["namePart"]["$"],
            "meta_data": lambda r: _jmap(
                (
                    "type_of_resource",
                    F.when(
                        _first(r["rec"]["mods"]["typeOfResource"])["usage"]
                        == "primary",
                        _first(r["rec"]["mods"]["typeOfResource"])["$"],
                    ),
                ),
                ("genre", r["rec"]["mods"]["genre"]["$"]),
                (
                    "date_issued",
                    r["rec"]["mods"]["originInfo"]["dateIssued"]["$"],
                ),
                (
                    "publisher",
                    r["rec"]["mods"]["originInfo"]["publisher"]["$"],
                ),
            ),
        },
    )


# ---------------------------------------------------------------------------
# rawpixel (raw_pixel.py:53-144)
# ---------------------------------------------------------------------------

RAWPIXEL_RECORD = (
    "id string, freecc0 boolean, url string, image_opengraph string, "
    "image_400 string, image_title string, artist_names string, "
    "pinterest_description string, keywords_raw string"
)

_RAWPIXEL_TAG_BLACKLIST = ["cc0", "creative commons", "creative commons 0"]


def rawpixel_spec() -> ProviderSpec:
    qdim = lambda r, p: F.regexp_extract(  # noqa: E731
        r["image_opengraph"], rf"[?&]{p}=(\d+)", 1
    )
    return ProviderSpec(
        provider="rawpixel",
        record_schema=RAWPIXEL_RECORD,
        record_filter=lambda r: r["freecc0"]
        & r["url"].isNotNull()
        & r["image_opengraph"].isNotNull(),
        columns={
            "foreign_identifier": lambda r: r["id"],
            "foreign_landing_url": lambda r: r["url"],
            "url": lambda r: r["image_opengraph"],
            "thumbnail": lambda r: r["image_400"],
            # dimensions from the rescale query params, not the metadata
            # (raw_pixel.py:70-83)
            "width": lambda r: qdim(r, "w"),
            "height": lambda r: qdim(r, "h"),
            "license": lambda r: _S("cc0"),
            "license_version": lambda r: _S("1.0"),
            "title": lambda r: r["image_title"],
            "creator": lambda r: F.trim(
                F.regexp_replace(
                    F.coalesce(r["artist_names"], _S("")),
                    r"\(Source\)",
                    "",
                )
            ),
            "meta_data": lambda r: _jmap(
                ("description", r["pinterest_description"])
            ),
            # ','-split, stripped, CC-boilerplate dropped (raw_pixel:99-112)
            "tags": lambda r: F.to_json(
                F.filter(
                    F.transform(
                        F.split(F.coalesce(r["keywords_raw"], _S("")), ","),
                        lambda w: F.trim(w),
                    ),
                    lambda w: ~w.isin(*_RAWPIXEL_TAG_BLACKLIST) & (w != ""),
                )
            ),
        },
    )


# ---------------------------------------------------------------------------
# science museum (science_museum.py:131-290)
# ---------------------------------------------------------------------------

_SCI_SIZE = (
    "struct<location string, measurements struct<dimensions "
    "array<struct<dimension string, value int>>>>"
)
SCIENCE_RECORD = (
    "id string, links struct<self string>, attributes struct<"
    "summary_title string, identifier array<struct<value string>>, "
    "name array<struct<value string>>, categories array<struct<value string>>, "
    "legal struct<credit_line string>, "
    "description array<struct<value string>>, "
    "lifecycle struct<creation array<struct<maker "
    "array<struct<summary_title string>>>>>, "
    f"multimedia array<struct<admin struct<uid string>, "
    f"processed struct<large {_SCI_SIZE}, medium {_SCI_SIZE}, "
    "large_thumbnail struct<location string>, "
    "medium_thumbnail struct<location string>, "
    "small_thumbnail struct<location string>>, "
    "source struct<legal struct<rights array<struct<usage_terms string>>>>>>>"
)

_SCI_BASE = "https://coimages.sciencemuseumgroup.org.uk/images/"


def _sci_check_url(url: Column) -> Column:
    """Relative image paths get the museum CDN base (science:227-238)."""
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(url.contains("http"), url).otherwise(F.concat(_S(_SCI_BASE), url))
    )


def _sci_size(img: Column) -> Column:
    """large → medium preference (science:199-212)."""
    p = img["processed"]
    return F.coalesce(
        F.when(p["large"]["location"].isNotNull(), p["large"]),
        F.when(p["medium"]["location"].isNotNull(), p["medium"]),
    )


def _sci_dim(img: Column, which: str) -> Column:
    """measurements.dimensions keyed list → height/width (science:239-249)."""
    dims = _sci_size(img)["measurements"]["dimensions"]
    return _first(
        F.filter(
            F.coalesce(dims, F.array()), lambda d: d["dimension"] == which
        )
    )["value"]


def _sci_terms(img: Column) -> Column:
    return _first(img["source"]["legal"]["rights"])["usage_terms"]


def science_museum_spec() -> ProviderSpec:
    def lic(part: int):
        def get(r: Column) -> Column:
            # 'CC-BY-NC-SA 4.0' → ('by-nc-sa', '4.0') (science:165-169,251-260)
            terms = F.lower(_sci_terms(r["img"]))
            piece = F.element_at(F.split(terms, " "), part + 1)
            return (
                F.regexp_replace(piece, r"^cc-", "") if part == 0 else piece
            )

        return get

    return ProviderSpec(
        provider="sciencemuseum",
        record_schema=SCIENCE_RECORD,
        record_filter=lambda r: r["links"]["self"].isNotNull(),
        images=lambda r: F.filter(
            F.coalesce(r["attributes"]["multimedia"], F.array()),
            lambda m: m["admin"]["uid"].isNotNull()
            & _sci_size(m)["location"].isNotNull()
            & _sci_terms(m).isNotNull(),
        ),
        columns={
            "foreign_identifier": lambda r: r["img"]["admin"]["uid"],
            "foreign_landing_url": lambda r: r["rec"]["links"]["self"],
            "url": lambda r: _sci_check_url(_sci_size(r["img"])["location"]),
            "thumbnail": lambda r: _sci_check_url(
                F.coalesce(
                    r["img"]["processed"]["large_thumbnail"]["location"],
                    r["img"]["processed"]["medium_thumbnail"]["location"],
                    r["img"]["processed"]["small_thumbnail"]["location"],
                )
            ),
            "width": lambda r: _sci_dim(r["img"], "width"),
            "height": lambda r: _sci_dim(r["img"], "height"),
            "license": lic(0),
            "license_version": lic(1),
            "title": lambda r: r["rec"]["attributes"]["summary_title"],
            "creator": lambda r: _first(
                _first(
                    r["rec"]["attributes"]["lifecycle"]["creation"]
                )["maker"]
            )["summary_title"],
            "meta_data": lambda r: _jmap(
                (
                    "accession number",
                    _first(r["rec"]["attributes"]["identifier"])["value"],
                ),
                ("name", _first(r["rec"]["attributes"]["name"])["value"]),
                (
                    "category",
                    _first(r["rec"]["attributes"]["categories"])["value"],
                ),
                (
                    "creditline",
                    r["rec"]["attributes"]["legal"]["credit_line"],
                ),
                (
                    "description",
                    _first(r["rec"]["attributes"]["description"])["value"],
                ),
            ),
        },
    )


# ---------------------------------------------------------------------------
# statens museum (staten_museum.py:93-225)
# ---------------------------------------------------------------------------

STATEN_RECORD = (
    "object_number string, rights string, created string, "
    "collection array<string>, techniques array<string>, "
    "colors array<string>, production array<struct<creator string>>, "
    "titles array<struct<title string>>, "
    "image_iiif_id string, image_height int, image_width int, "
    "alternative_images array<struct<iiif_id string, height int, width int>>"
)

_STATEN_LANDING = "https://open.smk.dk/en/artwork/image/"
_STATEN_IMAGE_SIZE = "max"
_STATEN_THUMBNAIL_SIZE = 400


def _staten_img_url(iiif: Column) -> Column:
    return F.concat(iiif, F.lit(f"/full/{_STATEN_IMAGE_SIZE}/0/default.jpg"))


def _staten_thumb_url(iiif: Column) -> Column:
    return F.concat(
        iiif, F.lit(f"/full/!{_STATEN_THUMBNAIL_SIZE},/0/default.jpg")
    )


def staten_spec() -> ProviderSpec:
    return ProviderSpec(
        provider="statensmuseum",
        record_schema=STATEN_RECORD,
        # cc rights + object number required (staten:103-110,189-196)
        record_filter=lambda r: F.coalesce(r["rights"], _S("")).contains(
            "creativecommons"
        )
        & r["object_number"].isNotNull(),
        # primary iiif image + alternative_images (staten:133-174)
        images=lambda r: F.concat(
            F.filter(
                F.array(
                    F.struct(
                        r["image_iiif_id"].alias("iiif_id"),
                        r["image_height"].alias("height"),
                        r["image_width"].alias("width"),
                    )
                ),
                lambda i: i["iiif_id"].isNotNull(),
            ),
            F.filter(
                F.coalesce(r["alternative_images"], F.array()),
                lambda i: i["iiif_id"].isNotNull(),
            ),
        ),
        columns={
            "foreign_identifier": lambda r: r["img"]["iiif_id"],
            "foreign_landing_url": lambda r: F.concat(
                _S(_STATEN_LANDING), r["rec"]["object_number"]
            ),
            "url": lambda r: _staten_img_url(r["img"]["iiif_id"]),
            "thumbnail": lambda r: _staten_thumb_url(r["img"]["iiif_id"]),
            "width": lambda r: r["img"]["width"],
            "height": lambda r: r["img"]["height"],
            "license": lambda r: _S("cc0"),
            "license_version": lambda r: _S("1.0"),
            "creator": lambda r: _first(r["rec"]["production"])["creator"],
            "title": lambda r: _first(r["rec"]["titles"])["title"],
            "meta_data": lambda r: _jmap(
                ("created_date", r["rec"]["created"]),
                ("collection", F.array_join(r["rec"]["collection"], ",")),
                ("techniques", F.array_join(r["rec"]["techniques"], ",")),
                ("colors", F.array_join(r["rec"]["colors"], ",")),
            ),
        },
    )


# ---------------------------------------------------------------------------
# thingiverse (Thingiverse.py:38-185)
# ---------------------------------------------------------------------------

THINGIVERSE_RECORD = (
    "id string, license string, description string, name string, "
    "public_url string, "
    "creator struct<first_name string, last_name string, name string, "
    "public_url string>, tags array<struct<name string>>, "
    "files array<struct<default_image struct<id string, url string, "
    "sizes array<struct<type string, size string, url string>>>>>"
)


def _thing_size(img: Column, size: str) -> Column:
    """First display-type size entry of the given size label
    (Thingiverse.py:143-151)."""
    return _first(
        F.filter(
            F.coalesce(img["default_image"]["sizes"], F.array()),
            lambda s: (F.lower(F.trim(s["type"])) == "display")
            & (F.lower(s["size"]) == size),
        )
    )["url"]


def _thing_image_url(img: Column) -> Column:
    return F.trim(
        F.coalesce(_thing_size(img, "large"), _thing_size(img, "medium"))
    )


def thingiverse_spec() -> ProviderSpec:
    return ProviderSpec(
        provider="thingiverse",
        record_schema=THINGIVERSE_RECORD,
        record_filter=lambda r: F.lower(
            F.coalesce(r["license"], _S(""))
        ).contains("creative commons - public domain dedication"),
        images=lambda r: F.filter(
            F.coalesce(r["files"], F.array()),
            lambda f: f["default_image"].isNotNull()
            & f["default_image"]["url"].isNotNull()
            & _thing_image_url(f).isNotNull(),
        ),
        columns={
            "foreign_identifier": lambda r: F.coalesce(
                r["img"]["default_image"]["id"], _thing_image_url(r["img"])
            ),
            "foreign_landing_url": lambda r: F.coalesce(
                F.trim(r["rec"]["public_url"]),
                F.concat(
                    _S("https://www.thingiverse.com/thing:"), r["rec"]["id"]
                ),
            ),
            "url": lambda r: _thing_image_url(r["img"]),
            "thumbnail": lambda r: F.trim(_thing_size(r["img"], "medium")),
            "license": lambda r: _S("cc0"),
            "license_version": lambda r: _S("1.0"),
            "creator": lambda r: F.coalesce(
                F.nullif(
                    F.trim(
                        F.concat_ws(
                            " ",
                            r["rec"]["creator"]["first_name"],
                            r["rec"]["creator"]["last_name"],
                        )
                    ),
                    _S(""),
                ),
                r["rec"]["creator"]["name"],
            ),
            "creator_url": lambda r: F.trim(r["rec"]["creator"]["public_url"]),
            "title": lambda r: r["rec"]["name"],
            "meta_data": lambda r: _jmap(
                ("description", r["rec"]["description"]),
                ("3d_model", r["img"]["default_image"]["url"]),
            ),
            # tag dicts carry the provider name (Thingiverse.py:113)
            "tags": lambda r: F.to_json(
                F.transform(
                    F.coalesce(r["rec"]["tags"], F.array()),
                    lambda t: F.struct(
                        F.trim(t["name"]).alias("name"),
                        _S("thingiverse").alias("provider"),
                    ),
                )
            ),
        },
    )


# ---------------------------------------------------------------------------
# walters art museum (walters_art_museum.py:165-208)
# ---------------------------------------------------------------------------

WALTERS_RECORD = (
    "ObjectNumber string, ResourceURL string, "
    "PrimaryImage struct<Raw string, Small string>, Creator string, "
    "Title string, PublicAccessDate string, Collection string, "
    "Medium string, Classification string, Description string, "
    "CreditLine string"
)

_WALTERS_SITE = "https://art.thewalters.org"


def walters_spec() -> ProviderSpec:
    return ProviderSpec(
        provider="waltersartmuseum",
        record_schema=WALTERS_RECORD,
        columns={
            "foreign_identifier": lambda r: r["ObjectNumber"],
            "foreign_landing_url": lambda r: r["ResourceURL"],
            "url": lambda r: r["PrimaryImage"]["Raw"],
            "thumbnail": lambda r: r["PrimaryImage"]["Small"],
            # fixed CC0 URL (walters:171)
            "license": lambda r: _S("cc0"),
            "license_version": lambda r: _S("1.0"),
            "creator": lambda r: r["Creator"],
            "creator_url": lambda r: F.when(
                r["Creator"].isNotNull() & (r["Creator"] != ""),
                F.concat(
                    _S(f"{_WALTERS_SITE}/browse/"), F.lower(r["Creator"])
                ),
            ),
            "title": lambda r: r["Title"],
            "meta_data": lambda r: _jmap(
                ("ObjectNumber", r["ObjectNumber"]),
                ("PublicAccessDate", r["PublicAccessDate"]),
                ("Collection", r["Collection"]),
                ("Medium", r["Medium"]),
                ("Classification", r["Classification"]),
                ("Description", r["Description"]),
                ("CreditLine", r["CreditLine"]),
            ),
        },
    )


# ---------------------------------------------------------------------------
# phylopic (phylopic.py:154-260)
# ---------------------------------------------------------------------------

PHYLOPIC_RECORD = (
    "uid string, licenseURL string, credit string, submitted string, "
    "submitter struct<firstName string, lastName string>, "
    "taxa array<struct<canonicalName struct<string string>>>, "
    "pngFiles array<struct<width int, height int, url string>>"
)

_PHYLOPIC_BASE = "http://phylopic.org"


def _phylopic_best_png(r: Column) -> Column:
    """Widest png with width ≥ 257 (phylopic:230-248)."""
    eligible = F.filter(
        F.coalesce(r["pngFiles"], F.array()), lambda p: p["width"] >= 257
    )
    return _first(
        F.array_sort(
            eligible,
            lambda a, b: F.when(a["width"] > b["width"], -1)
            .when(a["width"] < b["width"], 1)
            .otherwise(0),
        )
    )


def _phylopic_taxa(r: Column) -> Column:
    return F.transform(
        F.filter(
            F.coalesce(r["taxa"], F.array()),
            lambda t: t["canonicalName"].isNotNull(),
        ),
        lambda t: F.coalesce(t["canonicalName"]["string"], _S("")),
    )


def phylopic_spec() -> ProviderSpec:
    def lic(part: str):
        return lambda r: license_from_path(r["licenseURL"])[part]

    img_url = lambda r: F.concat(  # noqa: E731
        _S(_PHYLOPIC_BASE), _phylopic_best_png(r)["url"]
    )
    return ProviderSpec(
        provider="phylopic",
        record_schema=PHYLOPIC_RECORD,
        record_filter=lambda r: _phylopic_best_png(r)["url"].isNotNull(),
        columns={
            "foreign_identifier": lambda r: img_url(r),
            "foreign_landing_url": lambda r: F.concat(
                _S(f"{_PHYLOPIC_BASE}/image/"), r["uid"]
            ),
            "url": img_url,
            # the 256-wide png is the thumbnail (phylopic:241-243)
            "thumbnail": lambda r: F.concat(
                _S(_PHYLOPIC_BASE),
                _first(
                    F.filter(
                        F.coalesce(r["pngFiles"], F.array()),
                        lambda p: p["width"] == 256,
                    )
                )["url"],
            ),
            "width": lambda r: _phylopic_best_png(r)["width"],
            "height": lambda r: _phylopic_best_png(r)["height"],
            "license": lic("license"),
            "license_version": lic("license_version"),
            "creator": lambda r: F.trim(
                F.concat_ws(
                    " ",
                    r["submitter"]["firstName"],
                    r["submitter"]["lastName"],
                )
            ),
            "title": lambda r: F.coalesce(_first(_phylopic_taxa(r)), _S("")),
            "meta_data": lambda r: F.to_json(
                F.struct(
                    _phylopic_taxa(r).alias("taxa"),
                    F.when(
                        r["credit"].isNotNull() & (r["credit"] != ""),
                        F.trim(r["credit"]),
                    ).alias("credit_line"),
                    F.when(
                        r["credit"].isNotNull() & (r["credit"] != ""),
                        F.trim(r["submitted"]),
                    ).alias("pub_date"),
                )
            ),
        },
    )


# ---------------------------------------------------------------------------
# museums victoria (museum_victoria.py:98-226)
# ---------------------------------------------------------------------------

_MV_SIZE = "struct<uri string, height int, width int>"
VICTORIA_RECORD = (
    "id string, displayTitle string, dateModified string, category string, "
    "physicalDescription string, keywords array<string>, "
    "classifications array<string>, "
    "media array<struct<type string, id string, creators array<string>, "
    "licence struct<uri string>, thumbnail struct<uri string>, "
    f"large {_MV_SIZE}, medium {_MV_SIZE}, small {_MV_SIZE}>>"
)

_MV_LANDING = "https://collections.museumsvictoria.com.au/"


def _mv_size(m: Column) -> Column:
    """large → medium → small (museum_victoria:165-183)."""
    return F.coalesce(
        F.when(m["large"]["uri"].isNotNull(), m["large"]),
        F.when(m["medium"]["uri"].isNotNull(), m["medium"]),
        F.when(m["small"]["uri"].isNotNull(), m["small"]),
    )


def victoria_spec() -> ProviderSpec:
    def lic(part: str):
        return lambda r: license_from_path(r["img"]["licence"]["uri"])[part]

    return ProviderSpec(
        provider="museumsvictoria",
        record_schema=VICTORIA_RECORD,
        images=lambda r: F.filter(
            F.coalesce(r["media"], F.array()),
            lambda m: (m["type"] == "image")
            & m["id"].isNotNull()
            & _mv_size(m)["uri"].isNotNull()
            & F.coalesce(m["licence"]["uri"], _S("")).contains(
                "creativecommons"
            ),
        ),
        columns={
            "foreign_identifier": lambda r: r["img"]["id"],
            "foreign_landing_url": lambda r: F.concat(
                _S(_MV_LANDING), r["rec"]["id"]
            ),
            "url": lambda r: _mv_size(r["img"])["uri"],
            "thumbnail": lambda r: r["img"]["thumbnail"]["uri"],
            "width": lambda r: _mv_size(r["img"])["width"],
            "height": lambda r: _mv_size(r["img"])["height"],
            "license": lic("license"),
            "license_version": lic("license_version"),
            "title": lambda r: r["rec"]["displayTitle"],
            "creator": lambda r: F.array_join(
                F.coalesce(r["img"]["creators"], F.array()), ","
            ),
            "meta_data": lambda r: _jmap(
                ("datemodified", r["rec"]["dateModified"]),
                ("category", r["rec"]["category"]),
                ("description", r["rec"]["physicalDescription"]),
                (
                    "keywords",
                    F.when(
                        r["rec"]["keywords"].isNotNull(),
                        F.array_join(r["rec"]["keywords"], ","),
                    ),
                ),
                (
                    "classifications",
                    F.when(
                        r["rec"]["classifications"].isNotNull(),
                        F.array_join(r["rec"]["classifications"], ","),
                    ),
                ),
            ),
        },
    )


# ---------------------------------------------------------------------------
# finnish museums (finnish_museums.py:101-150)
# ---------------------------------------------------------------------------

FINNISH_RECORD = (
    "id string, title string, imageRights struct<link string>, "
    "buildings array<struct<value string>>, images array<string>, "
    "subjects array<array<string>>"
)

_FINNISH_API = "https://api.finna.fi"
_FINNISH_LANDING = "https://www.finna.fi/Record/"

# provider_details.py:28-33 — building path → sub-provider
FINNISH_SUB_PROVIDERS = {
    "national_museum_of_finland": "0/Suomen kansallismuseo/",
    "finnish_heritage_agency": "0/Museovirasto/",
    "finnish_satakunnan_museum": "0/SATMUSEO/",
    "finnish_military_museum": "0/SA-kuva/",
}


def finnish_spec() -> ProviderSpec:
    def lic(part: str):
        return lambda r: license_from_path(r["rec"]["imageRights"]["link"])[
            part
        ]

    building = lambda r: _first(r["buildings"])["value"]  # noqa: E731
    source = lambda r: F.coalesce(  # noqa: E731
        *[
            F.when(F.lit(path).contains(building(r["rec"])), _S(sub))
            for sub, path in FINNISH_SUB_PROVIDERS.items()
        ],
        _S("finnishmuseums"),
    )
    return ProviderSpec(
        provider="finnishmuseums",
        record_schema=FINNISH_RECORD,
        images=lambda r: F.coalesce(r["images"], F.array()),
        columns={
            "foreign_identifier": lambda r: r["rec"]["id"],
            "foreign_landing_url": lambda r: F.concat(
                _S(_FINNISH_LANDING), r["rec"]["id"]
            ),
            "url": lambda r: F.concat(_S(_FINNISH_API), r["img"]),
            "license": lic("license"),
            "license_version": lic("license_version"),
            "title": lambda r: r["rec"]["title"],
            "source": source,
            # subjects is a list of lists — flattened (finnish:128-135)
            "tags": lambda r: F.when(
                r["rec"]["subjects"].isNotNull(),
                F.to_json(F.flatten(r["rec"]["subjects"])),
            ),
        },
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def all_provider_specs() -> dict[str, ProviderSpec]:
    """Every provider the reference ships a script for, by provider id."""
    specs = [
        flickr_spec(),
        wikimedia_spec(),
        smithsonian_spec(),
        europeana_spec(),
        cleveland_spec(),
        met_spec(),
        brooklyn_spec(),
        nypl_spec(),
        rawpixel_spec(),
        science_museum_spec(),
        staten_spec(),
        thingiverse_spec(),
        walters_spec(),
        phylopic_spec(),
        victoria_spec(),
        finnish_spec(),
    ]
    return {s.provider: s for s in specs}
