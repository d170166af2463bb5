"""Deterministic synthetic world — FIXTURES.md F1-F5 made concrete.

Everything derives from ``seed=42`` + row index; no randomness at test time,
no external data. Two halves:

- :func:`images_df` — the primary input table (BASELINE.json input_hint
  schema: image_id, bytes, w, h, fmt, caption, phash). Generated
  *distributed* via ``mapInPandas`` so bench-scale row counts never
  materialize on the driver; pixel payloads use the engine codecs
  (:mod:`pgosm_flex_spark.images.codec`). Captions embed the geotag and
  OSM-style tags (F3 vocabulary). 30% of points land in one small hot disc
  to exercise skew handling (F1).

- :func:`osm_objects_pdf` / :func:`osm_objects_df` — the feature side
  (F2): a strict nesting hierarchy of admin polygons (country ⊃ state ⊃
  city ⊃ suburb ⊃ neighbourhood), a street grid with known intersections,
  poi/building/water features, and relations (osm_id < 0) whose members
  also appear standalone (dedup anti-join food,
  /root/reference/flex-config/sql/place.sql:34-56 semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pgosm_flex_spark.geometry import wkb
from pgosm_flex_spark.images import codec

# world bounds (mirrors the D.C. extent of the reference's test extract)
LON_MIN, LON_MAX = -77.12, -76.90
LAT_MIN, LAT_MAX = 38.79, 39.00
HOT_CENTER = (-77.0366, 38.8977)
HOT_RADIUS = 0.004
HOT_FRACTION = 0.3

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


# ---------------------------------------------------------------------------
# deterministic per-index primitives
# ---------------------------------------------------------------------------

def _mix(i: int, salt: int) -> int:
    """Deterministic 63-bit mix of (i, salt) — splitmix64 finalizer."""
    z = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + 42) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return (z ^ (z >> 31)) & 0x7FFFFFFFFFFFFFFF


def _unit(i: int, salt: int) -> float:
    return _mix(i, salt) / float(1 << 63)


def point_lonlat(i: int) -> tuple[float, float]:
    """Deterministic geotag of image i; ~30% in the hot disc (F1)."""
    if _unit(i, 1) < HOT_FRACTION:
        r = HOT_RADIUS * np.sqrt(_unit(i, 2))
        theta = 2 * np.pi * _unit(i, 3)
        return HOT_CENTER[0] + r * np.cos(theta), HOT_CENTER[1] + r * np.sin(theta)
    lon = LON_MIN + (LON_MAX - LON_MIN) * _unit(i, 4)
    lat = LAT_MIN + (LAT_MAX - LAT_MIN) * _unit(i, 5)
    return lon, lat


# F3 caption tag vocabulary: each branch family gets positives and negatives
_HIGHWAYS = ["motorway", "primary", "residential", "footway", "path", "service", "cycleway"]
_MAXSPEEDS = ["30", "55 mph", "garbage", None]
_NAMES = [
    {"name": "Main Street"},
    {"name:en": "East Road"},
    {"short_name": "shortN"},
    {"alt_name": "altN"},
    {"old_name": "oldN"},
    {},
]
_SHOPS = ["deli", "books", "bakery"]
_AMENITIES = ["restaurant", "school", "bench", "fuel", "cafe", "shelter"]
_PLACES = ["city", "suburb", "neighbourhood"]
_NATURALS = ["peak", "water", "tree", "bay"]
_WATERWAYS = ["river", "stream"]
_ACCESS = [None, "no", "private", "yes"]


def point_tags(i: int) -> dict[str, str]:
    """OSM-style tags of image i — rotates through filter families so every
    layer predicate branch sees positives and negatives (F3)."""
    fam = _mix(i, 10) % 10
    tags: dict[str, str] = {}
    tags.update(_NAMES[_mix(i, 11) % len(_NAMES)])
    if fam == 0:  # road-ish node
        tags["highway"] = _HIGHWAYS[_mix(i, 12) % len(_HIGHWAYS)]
        ms = _MAXSPEEDS[_mix(i, 13) % len(_MAXSPEEDS)]
        if ms:
            tags["maxspeed"] = ms
        acc = _ACCESS[_mix(i, 14) % len(_ACCESS)]
        if acc:
            tags["access"] = acc
    elif fam == 1:  # place node
        tags["place"] = _PLACES[_mix(i, 15) % len(_PLACES)]
        tags["admin_level"] = str(4 + _mix(i, 16) % 6)
    elif fam == 2:  # shop
        tags["shop"] = _SHOPS[_mix(i, 17) % len(_SHOPS)]
        tags["addr:housenumber"] = str(100 + _mix(i, 18) % 900)
        tags["addr:street"] = "Main%20Street".replace("%20", " ")
    elif fam == 3:  # amenity
        tags["amenity"] = _AMENITIES[_mix(i, 19) % len(_AMENITIES)]
        if tags["amenity"] == "restaurant":
            tags["cuisine"] = "pizza"
        if tags["amenity"] == "shelter":
            tags["shelter_type"] = "basic_hut"
    elif fam == 4:  # natural / water
        tags["natural"] = _NATURALS[_mix(i, 20) % len(_NATURALS)]
        if _mix(i, 21) % 3 == 0:
            tags["ele"] = ["1800", "1955 m", "8001 ft", "bad"][_mix(i, 22) % 4]
    elif fam == 5:  # waterway
        tags["waterway"] = _WATERWAYS[_mix(i, 23) % len(_WATERWAYS)]
    elif fam == 6:  # building w/ address
        tags["building"] = ["yes", "house", "retail"][_mix(i, 24) % 3]
        if _mix(i, 25) % 2 == 0:
            tags["addr:city"] = "Washington"
            tags["addr:postcode"] = str(20000 + _mix(i, 26) % 100)
    elif fam == 7:  # tourism / historic / man_made
        k = ["tourism", "historic", "man_made"][_mix(i, 27) % 3]
        v = {"tourism": "hotel", "historic": "monument", "man_made": ["tower", "works", "pipeline"][_mix(i, 28) % 3]}[k]
        tags[k] = v
    elif fam == 8:  # junk-only rows exercise clean_tags skip
        tags = {"source": "synthetic", "created_by": "fixture", "odbl": "clean"}
    else:  # mixed: leisure / landuse / barrier
        k = ["leisure", "landuse", "barrier"][_mix(i, 29) % 3]
        v = {"leisure": "park", "landuse": ["cemetery", "farm"][_mix(i, 30) % 2], "barrier": "fence"}[k]
        tags[k] = v
    return tags


def caption_of(i: int) -> str:
    lon, lat = point_lonlat(i)
    parts = [f"lon={lon:.7f}", f"lat={lat:.7f}"]
    for k, v in sorted(point_tags(i).items()):
        parts.append(f"{k}={str(v).replace(' ', '%20')}")
    return " ".join(parts)


def image_dims(i: int) -> tuple[int, int]:
    return 64 + (i % 3) * 32, 64 + (i % 4) * 32  # (h, w) per F1


def image_fmt(i: int) -> str:
    return "png" if i % 3 == 0 else "jpeg"


def make_image_row(i: int) -> tuple[str, bytes, int, int, str, str, int]:
    h, w = image_dims(i)
    fmt = image_fmt(i)
    arr = codec.synth_pixels(i, h, w)
    data = codec.encode(arr, fmt, quality=85)
    decoded = codec.decode(data)
    return (f"img{i:012d}", data, w, h, fmt, caption_of(i), codec.phash(decoded))


# ---------------------------------------------------------------------------
# images table (distributed generation)
# ---------------------------------------------------------------------------

def images_df(spark: SparkSession, n: int, with_pixels: bool = True) -> DataFrame:
    """The F1 ``images`` table, generated partition-parallel.

    ``with_pixels=False`` skips the byte payloads (bytes=NULL, phash from
    caption) for tests that only need the geo/tag side — much faster.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"].tolist():
                i = int(i)
                if with_pixels:
                    rows.append(make_image_row(i))
                else:
                    h, w = image_dims(i)
                    rows.append(
                        (f"img{i:012d}", None, w, h, image_fmt(i), caption_of(i), _mix(i, 99) - (1 << 62))
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n).mapInPandas(gen, schema=IMAGES_SCHEMA)


AUDIO_SCHEMA = "audio_id string, bytes binary, sample_rate int, caption string"
VIDEO_SCHEMA = "video_id string, bytes binary, n_frames int, fps int, caption string"


def audio_df(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic audio rows (fake FAU1 payloads), partition-parallel."""
    from pgosm_flex_spark.images import codec

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"].tolist():
                i = int(i)
                sr = 16000 if i % 3 else 8000
                pcm = codec.synth_audio(i, sample_rate=sr, seconds=0.5 + (i % 4) * 0.25)
                rows.append(
                    (f"aud{i:012d}", codec.encode_audio(pcm, sr), sr, caption_of(i))
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "bytes", "sample_rate", "caption"]
            )

    return spark.range(n).mapInPandas(gen, schema=AUDIO_SCHEMA)


def video_df(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic video rows (fake FVI1 payloads), partition-parallel."""
    from pgosm_flex_spark.images import codec

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"].tolist():
                i = int(i)
                nf = 6 + (i % 3) * 6
                rows.append(
                    (f"vid{i:012d}", codec.synth_video(i, n_frames=nf), nf, 6, caption_of(i))
                )
            yield pd.DataFrame(
                rows, columns=["video_id", "bytes", "n_frames", "fps", "caption"]
            )

    return spark.range(n).mapInPandas(gen, schema=VIDEO_SCHEMA)


# ---------------------------------------------------------------------------
# feature side: admin hierarchy + streets + misc features
# ---------------------------------------------------------------------------

_rect_wkb = wkb.encode_rect


ADMIN_GRIDS = [
    # (grid_n, admin_level, place_tag, name_prefix)
    (1, 2, None, "Country"),
    (2, 4, None, "State"),
    (4, 8, "city", "City"),
    (8, 9, "suburb", "Suburb"),
    (16, 10, "neighbourhood", "Nbhd"),
]
# Per-level ABSOLUTE inset (degrees) off the shared grid lines, strictly
# increasing with depth: at a grid line two levels share, the finer cell's
# edge sits strictly inside the coarser cell's — which is what makes every
# level-g cell strictly inside exactly one ancestor per coarser level (and
# keeps all edges off each other; PIP boundary ties are undefined,
# SURVEY.md §7.3). A PROPORTIONAL shrink cannot do this: a 0.995 factor
# insets a finer cell by a SMALLER absolute margin than its parent, so at
# shared grid lines every child poked past its parent's shrunk edge and no
# consecutive-level strict containment existed at all (verified by brute
# force; levels 8/9/10 had zero direct-parent pairs). e is sized well below
# the finest cell (span/16 ≈ 0.014°) so no cell degenerates.
_INSET_E = 2e-5


def _level_inset(level_idx: int) -> float:
    return _INSET_E * level_idx


def admin_polygons() -> pd.DataFrame:
    """The nested admin hierarchy (F2). Every level-g cell is strictly inside
    exactly one ancestor per coarser level → closed-form nesting oracle."""
    rows = []
    osm_id = 1000
    for level_idx, (grid_n, admin_level, place_tag, prefix) in enumerate(ADMIN_GRIDS):
        dx = (LON_MAX - LON_MIN) / grid_n
        dy = (LAT_MAX - LAT_MIN) / grid_n
        inset = _level_inset(level_idx)
        for gx in range(grid_n):
            for gy in range(grid_n):
                cx = LON_MIN + (gx + 0.5) * dx
                cy = LAT_MIN + (gy + 0.5) * dy
                hw = dx / 2 - inset
                hh = dy / 2 - inset
                tags = {"boundary": "administrative", "admin_level": str(admin_level),
                        "name": f"{prefix} {gx}-{gy}"}
                if place_tag:
                    tags["place"] = place_tag
                rows.append(
                    dict(
                        osm_id=osm_id, geom_type="W", is_closed=True, tags=tags,
                        lon=None, lat=None,
                        geom_wkb=_rect_wkb(cx - hw, cy - hh, cx + hw, cy + hh),
                        member_ids=None,
                    )
                )
                osm_id += 1
    return pd.DataFrame(rows)


def street_grid(n_each: int = 8) -> pd.DataFrame:
    """Street grid: n_each horizontal + n_each vertical lines crossing at
    n_each² known intersections (routing edge-split oracle, F2)."""
    rows = []
    osm_id = 50000
    for k in range(n_each):
        frac = (k + 0.5) / n_each
        y = LAT_MIN + (LAT_MAX - LAT_MIN) * frac
        x = LON_MIN + (LON_MAX - LON_MIN) * frac
        hw_type = _HIGHWAYS[k % len(_HIGHWAYS)]
        # modulus over the FULL list so the None entry (no maxspeed tag)
        # actually occurs and the "25" default path is exercised — k % 3
        # could only ever index the three truthy entries
        tags_h = {"highway": hw_type, "name": f"H Street {k}",
                  "maxspeed": _MAXSPEEDS[k % len(_MAXSPEEDS)] or "25"}
        # mix the textual direction values ('yes' is the most common OSM
        # one-way tagging) with numeric ones so parse_oneway's direction-type
        # mapping is exercised, not just try_cast-able strings
        tags_v = {"highway": _HIGHWAYS[(k + 2) % len(_HIGHWAYS)], "ref": f"R-{k}",
                  "oneway": ["no", "yes", "-1"][k % 3]}
        line_h = wkb.encode_linestring(np.array([[LON_MIN, y], [LON_MAX, y]]))
        line_v = wkb.encode_linestring(np.array([[x, LAT_MIN], [x, LAT_MAX]]))
        rows.append(dict(osm_id=osm_id, geom_type="W", is_closed=False, tags=tags_h,
                         lon=None, lat=None, geom_wkb=line_h, member_ids=None))
        rows.append(dict(osm_id=osm_id + 1, geom_type="W", is_closed=False, tags=tags_v,
                         lon=None, lat=None, geom_wkb=line_v, member_ids=None))
        osm_id += 2
    return pd.DataFrame(rows)


def relations_with_members() -> pd.DataFrame:
    """Relations (osm_id < 0) whose member ways also exist standalone —
    exercises the dedup anti-join (/root/reference/flex-config/sql/place.sql:34-56).
    Members reference suburb-grid polygons (ids from admin_polygons order)."""
    # suburb grid starts after 1 + 4 + 16 country/state/city cells
    suburb_start = 1000 + 1 + 4 + 16
    rows = []
    for r in range(4):
        members = [suburb_start + r * 2, suburb_start + r * 2 + 1]
        rows.append(
            dict(
                osm_id=-(9000 + r), geom_type="R", is_closed=None,
                tags={"boundary": "administrative", "admin_level": "9",
                      "name": f"Suburb Rel {r}", "type": "boundary"},
                lon=None, lat=None,
                geom_wkb=_rect_wkb(LON_MIN + 0.01 * r, LAT_MIN, LON_MIN + 0.01 * r + 0.008, LAT_MIN + 0.008),
                member_ids=members,
            )
        )
    return pd.DataFrame(rows)


def misc_features(n: int = 120) -> pd.DataFrame:
    """poi/building/water/amenity node features with the F3 vocabulary."""
    rows = []
    for j in range(n):
        i = 700000 + j
        lon, lat = point_lonlat(i)
        rows.append(
            dict(
                osm_id=i, geom_type="N", is_closed=None, tags=point_tags(i),
                lon=lon, lat=lat, geom_wkb=None, member_ids=None,
            )
        )
    return pd.DataFrame(rows)


OSM_SCHEMA = (
    "osm_id long, geom_type string, is_closed boolean, tags map<string,string>, "
    "lon double, lat double, geom_wkb binary, member_ids array<long>"
)


def osm_objects_pdf() -> pd.DataFrame:
    return pd.concat(
        [admin_polygons(), street_grid(), relations_with_members(), misc_features()],
        ignore_index=True,
    )


def _clean_scalar(v):
    if v is None:
        return None
    if isinstance(v, float) and np.isnan(v):
        return None
    return v


def osm_objects_df(spark: SparkSession) -> DataFrame:
    from pyspark.sql import functions as F

    records = []
    for r in osm_objects_pdf().to_dict("records"):
        lon, lat = _clean_scalar(r["lon"]), _clean_scalar(r["lat"])
        closed = _clean_scalar(r["is_closed"])
        members = r["member_ids"]
        if not isinstance(members, list):
            members = None
        records.append(
            (
                int(r["osm_id"]), r["geom_type"],
                None if closed is None else bool(closed),
                list(r["tags"].items()),
                None if lon is None else float(lon),
                None if lat is None else float(lat),
                r["geom_wkb"] if isinstance(r["geom_wkb"], (bytes, bytearray)) else None,
                None if members is None else [int(m) for m in members],
            )
        )
    df = spark.createDataFrame(
        records,
        schema=OSM_SCHEMA.replace(
            "tags map<string,string>", "tags array<struct<key:string,value:string>>"
        ),
    )
    return df.withColumn("tags", F.map_from_entries("tags"))


# ---------------------------------------------------------------------------
# world scaling — replicate the fixture world onto a disjoint tile grid so
# the import job's fixed-size feature sections (layer build, relation dedup,
# nested rebuild, 45-table export) become DATA-PROPORTIONAL: the lever the
# full-job scaling pairs need (BASELINE.md §Full-JOB scaling measured the
# unscaled ~560-row world as a flat ~26 s Amdahl term at every core count).
# ---------------------------------------------------------------------------

# id stride between replicas; base fixture ids top out at ~700119 ≪ stride,
# and 2^63/stride leaves room for ~9e11 replicas
WORLD_ID_STRIDE = 10_000_000
# tile pitch: world extent + 25% margin keeps replicas strictly disjoint
# (no cross-replica containment, crossings, or dedup pairs)
_WORLD_SPAN_X = (LON_MAX - LON_MIN) * 1.25
_WORLD_SPAN_Y = (LAT_MAX - LAT_MIN) * 1.25


def world_replica_layout(k: int) -> tuple[int, float, float]:
    """(n_cols, span_x, span_y): replica ``r`` of a ``k``-scaled world sits
    at grid position ``(r % n_cols, r // n_cols)``, shifted by
    ``(col·span_x, row·span_y)`` degrees. Square-ish grid, bounds-checked
    against the valid lon/lat (and web-mercator) frame."""
    n_cols = max(1, int(np.ceil(np.sqrt(k))))
    n_rows = -(-k // n_cols)
    if (
        LON_MIN + n_cols * _WORLD_SPAN_X > 179.0
        or LAT_MIN + n_rows * _WORLD_SPAN_Y > 84.0
    ):
        raise ValueError(
            f"world_scale={k} overflows the lon/lat frame "
            f"({n_cols}×{n_rows} tiles of {_WORLD_SPAN_X:.3f}°×{_WORLD_SPAN_Y:.3f}°)"
        )
    return n_cols, _WORLD_SPAN_X, _WORLD_SPAN_Y


def replica_shift_cols(rep, k: int):
    """(dx, dy) degree-shift Columns for a replica-index Column — shared by
    the world generator and the import job's point-side mapping so both
    sides land on the same tiles (pure codegen)."""
    from pyspark.sql import functions as F

    n_cols, sx, sy = world_replica_layout(k)
    return (
        (rep % n_cols).cast("double") * F.lit(sx),
        F.floor(rep / n_cols).cast("double") * F.lit(sy),
    )


def osm_objects_scaled_df(spark: SparkSession, k: int) -> DataFrame:
    """The fixture world replicated ``k``× onto the disjoint tile grid.

    Per replica ``r``: ids shift by ``±r·WORLD_ID_STRIDE`` (sign-preserving,
    so relations stay negative and their ``member_ids`` references follow
    into the same replica), lon/lat shift by the tile offset (codegen), and
    every WKB geometry translates by the same offset (Arrow-batched kernel).
    Tags are unchanged — the layer predicates see ``k``× the rows of every
    family. Generation is distributed: the ~560-row base world broadcasts
    against ``spark.range(k)``, so no replica materializes on the driver."""
    from pyspark.sql import functions as F

    if k <= 1:
        return osm_objects_df(spark)
    world_replica_layout(k)  # bounds check before any Spark work
    base = osm_objects_df(spark)
    reps = spark.range(k).select(F.col("id").alias("__rep"))
    j = reps.crossJoin(F.broadcast(base))
    dx, dy = replica_shift_cols(F.col("__rep"), k)
    off = F.col("__rep") * F.lit(WORLD_ID_STRIDE)
    sign_off = F.when(F.col("osm_id") < 0, -off).otherwise(off)

    @pd_udf_binary
    def _translate(wkb_s: pd.Series, dx_s: pd.Series, dy_s: pd.Series) -> pd.Series:
        out = []
        for b, x, y in zip(wkb_s, dx_s, dy_s):
            if b is None:
                out.append(None)
                continue
            g = wkb.decode(bytes(b))
            shift = np.array([x, y], dtype=np.float64)
            out.append(wkb.rebuild(g, [r + shift for r in g.rings]))
        return pd.Series(out, dtype=object)

    return j.select(
        (F.col("osm_id") + sign_off).alias("osm_id"),
        "geom_type",
        "is_closed",
        "tags",
        (F.col("lon") + dx).alias("lon"),
        (F.col("lat") + dy).alias("lat"),
        _translate(F.col("geom_wkb"), dx, dy).alias("geom_wkb"),
        F.transform(
            "member_ids", lambda m: m + F.col("__rep") * F.lit(WORLD_ID_STRIDE)
        ).alias("member_ids"),
    )


def pd_udf_binary(fn):
    """Late-bound ``pandas_udf('binary')`` (the decorator resolves against
    the active session; module-level use would fail before one exists)."""
    from pyspark.sql import functions as F

    return F.pandas_udf(fn, "binary")
