"""SQLite catalog store for glasses and stock lenses.

Functional parity with reference library.py:51-185 and
library_items.py:42-142, built on the stdlib sqlite3 module (the
reference uses SQLAlchemy).  Catalog files register per-extension
parsers; records lazily parse their data blob into Material/System
objects via per-format parsers.  CLI: `python -m rayopt_tpu.io.library
<paths>` imports catalogs (zmf/agf/dir/glc/library.yml/xml).
"""

import hashlib
import logging
import os
import sqlite3
import time
import warnings

logger = logging.getLogger(__name__)

_SCHEMA = """
create table if not exists catalog (
    id integer primary key,
    name text, type text, source text, format text,
    version real, comment text, file text,
    date real, size integer, sha1 text, imported real
);
create table if not exists material (
    id integer primary key,
    name text, catalog_id integer references catalog(id)
        on delete cascade,
    comment text, section text, status integer, version real,
    code text, solid integer default 1, mirror integer default 0,
    nd real, vd real, density real, tce real, data text
);
create table if not exists lens (
    id integer primary key,
    name text, catalog_id integer references catalog(id)
        on delete cascade,
    comment text, section text, status integer, version real,
    elements integer, thickness real, radius real, shape text,
    aspheric integer default 0, toroidal integer default 0,
    grin integer default 0, efl real, enp real, data text
);
create index if not exists material_name on material (name);
create index if not exists lens_name on lens (name);
"""


class _Record:
    """Base for in-memory catalog records before insertion."""

    fields = ()
    parsers = {}

    def __init__(self, **kw):
        for f in self.fields:
            setattr(self, f, kw.pop(f, None))
        for k, v in kw.items():
            setattr(self, k, v)

    def row(self, catalog_id):
        return [catalog_id] + [getattr(self, f, None) for f in self.fields]


class LibMaterial(_Record):
    fields = ("name", "comment", "section", "status", "version", "code",
              "solid", "mirror", "nd", "vd", "density", "tce", "data")
    parsers = {}


class LibLens(_Record):
    fields = ("name", "comment", "section", "status", "version",
              "elements", "thickness", "radius", "shape", "aspheric",
              "toroidal", "grin", "efl", "enp", "data")
    parsers = {}


class Catalog(_Record):
    fields = ("name", "type", "source", "format", "version", "comment",
              "file", "date", "size", "sha1", "imported")
    parsers = {}  # keyed by file extension or basename

    def __init__(self, **kw):
        super().__init__(**kw)
        self.materials = []
        self.lenses = []

    def load(self, file):
        """Record file bookkeeping (mtime/size/sha1) and return the
        raw contents (reference library_items.py:132)."""
        self.file = file
        stat = os.stat(file)
        self.date = stat.st_mtime
        self.size = stat.st_size
        data = open(file, "rb").read()
        self.sha1 = hashlib.sha1(data).hexdigest()
        self.imported = time.time()
        try:
            return data.decode()
        except UnicodeDecodeError:
            return data

    @classmethod
    def parse(cls, file, session):
        """Dispatch to the registered reader by extension/basename
        (reference library_items.py:125)."""
        base = os.path.basename(file)
        ext = os.path.splitext(file)[1].lower()
        parser = cls.parsers.get(base) or cls.parsers.get(ext)
        if parser is None:
            raise KeyError("no parser for %s" % file)
        return parser(file, session)


class _Session:
    """Collects catalogs before they are written to the database."""

    def __init__(self):
        self.pending = []

    def add(self, catalog):
        self.pending.append(catalog)


class ParsedItem:
    """A lazily-parsing library row (reference library_items.py:42)."""

    def __init__(self, kind, row, fmt):
        self.kind = kind
        self.fmt = fmt
        for k, v in row.items():
            setattr(self, k, v)

    def parse(self):
        parsers = {"material": LibMaterial.parsers,
                   "lens": LibLens.parsers}[self.kind]
        return parsers[self.fmt](self.data, self)


class Library:
    """Singleton catalog store (reference library.py:51)."""

    _one = None

    @classmethod
    def one(cls, *args, **kwargs):
        if cls._one is None:
            cls._one = cls(*args, **kwargs)
        return cls._one

    def __init__(self, db=None):
        if self._one:
            warnings.warn("Library should be used as a singleton: "
                          "use Library.one()", stacklevel=3)
        from . import zemax, oslo, rii, codev
        zemax.register_parsers()
        oslo.register_parsers()
        rii.register_parsers()
        codev.register_parsers()
        if db is None:
            db = self.find_db()
        self.conn = sqlite3.connect(db)
        self.conn.row_factory = sqlite3.Row
        self.conn.executescript(_SCHEMA)
        self.conn.execute("pragma foreign_keys = on")

    def find_db(self):
        """User DB path; on first use the bundled refractiveindex.info
        catalog (rayopt_tpu/data/library.sqlite) is installed there
        (reference library.py:69-87)."""
        home = os.environ.get("RAYOPT_TPU_LIBRARY")
        if home:
            return home
        base = os.path.expanduser("~/.local/share/rayopt_tpu")
        os.makedirs(base, exist_ok=True)
        db = os.path.join(base, "library.sqlite")
        if not os.path.exists(db):
            bundled = os.path.join(os.path.dirname(__file__), "..",
                                   "data", "library.sqlite")
            if os.path.exists(bundled):
                import shutil
                shutil.copy(bundled, db)
        return db

    def load_all(self, paths, **kwargs):
        for path in paths:
            for i in sorted(os.listdir(path)):
                file_path = os.path.join(path, i)
                try:
                    self.load(file_path, **kwargs)
                except KeyError:
                    pass
                except Exception:
                    logger.exception("could not load %s", file_path)

    def load(self, fil, mode="refresh"):
        """Import one catalog file with mtime/size freshness checks
        (reference library.py:100)."""
        if mode in ("refresh", "reload"):
            res = self.conn.execute(
                "select id, date, size from catalog where file = ?",
                (fil,)).fetchone()
            if res:
                if mode == "refresh":
                    stat = os.stat(fil)
                    if (stat.st_mtime <= res["date"] or
                            stat.st_size == res["size"]):
                        return
                self.conn.execute("delete from material where "
                                  "catalog_id = ?", (res["id"],))
                self.conn.execute("delete from lens where "
                                  "catalog_id = ?", (res["id"],))
                self.conn.execute("delete from catalog where id = ?",
                                  (res["id"],))
        session = _Session()
        try:
            if Catalog.parse(fil, session):
                self._commit(session)
                logger.info("added %s", fil)
        except Exception:
            self.conn.rollback()
            raise

    def _commit(self, session):
        cur = self.conn.cursor()
        for cat in session.pending:
            cur.execute(
                "insert into catalog (%s) values (%s)" % (
                    ",".join(Catalog.fields),
                    ",".join("?"*len(Catalog.fields))),
                [getattr(cat, f, None) for f in Catalog.fields])
            cid = cur.lastrowid
            for m in cat.materials:
                cur.execute(
                    "insert into material (catalog_id, %s) values (%s)"
                    % (",".join(LibMaterial.fields),
                       ",".join("?"*(len(LibMaterial.fields) + 1))),
                    m.row(cid))
            for le in cat.lenses:
                cur.execute(
                    "insert into lens (catalog_id, %s) values (%s)"
                    % (",".join(LibLens.fields),
                       ",".join("?"*(len(LibLens.fields) + 1))),
                    le.row(cid))
        self.conn.commit()

    def get(self, *args, **kwargs):
        for k in self.get_all(*args, **kwargs):
            return k

    def get_all(self, typ, name=None, catalog=None, source=None,
                **kwargs):
        """Query by type/name/catalog/source; yields parsed objects
        (reference library.py:126)."""
        table = {"material": "material", "lens": "lens"}[typ]
        q = (f"select t.*, c.format as _format, c.name as _catalog, "
             f"c.source as _source from {table} t "
             f"join catalog c on t.catalog_id = c.id where 1=1")
        args = []
        if catalog is not None:
            q += " and lower(c.name) = lower(?)"
            args.append(catalog)
        if source is not None:
            q += " and lower(c.source) = lower(?)"
            args.append(source)
        base_q, base_args = q, list(args)
        if name is not None:
            q += " and lower(t.name) = lower(?)"
            args.append(name)
        q += " order by t.name"
        rows = self.conn.execute(q, args).fetchall()
        if not rows and name is not None:
            # rii names are "BOOK|PAGE"; fall back to a book-prefix
            # match ("BK7" -> "BK7|SCHOTT") and then a page-suffix
            # match ("LAFN7" -> "SCHOTT-LaF|LAFN7")
            like = base_q + " and lower(t.name) like lower(?) order by t.name"
            for pattern in (name + "|%", "%|" + name):
                rows = self.conn.execute(like, base_args + [pattern]
                                         ).fetchall()
                if rows:
                    break
        if not rows:
            raise KeyError(f"{typ} {source}/{catalog}/{name} not found")
        for row in rows:
            d = dict(row)
            fmt = d.pop("_format")
            d.pop("_catalog"), d.pop("_source")
            yield ParsedItem(typ, d, fmt).parse()


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--db", default=None)
    p.add_argument("-a", "--all", action="store_true",
                   help="test-parse all entries")
    p.add_argument("-m", "--material", help="test-parse a material")
    p.add_argument("-l", "--lens", help="test-parse a lens")
    p.add_argument("-n", "--nd", action="store_true",
                   help="check nd of materials against the catalog")
    p.add_argument("files", nargs="*")
    o = p.parse_args(argv)
    lib = Library(o.db)
    lib.load_all(o.files)
    for typ, query in (("material", o.material), ("lens", o.lens)):
        if not query:
            continue
        try:
            print(lib.get(typ, query))
        except KeyError as err:
            p.exit(1, "%s\n" % err.args[0])
    if o.all:
        for kind in ("material", "lens"):
            try:
                for item in lib.get_all(kind):
                    pass
            except KeyError:
                pass
    if o.nd:
        from ..materials import lambda_d
        for row in lib.conn.execute(
                "select m.*, c.format as _format from material m join "
                "catalog c on m.catalog_id = c.id where m.nd is not "
                "null"):
            d = dict(row)
            fmt = d.pop("_format")
            try:
                m = ParsedItem("material", d, fmt).parse()
                nd0 = m.refractive_index(lambda_d)
                if abs(d["nd"] - nd0) > .001:
                    print("nd mismatch", d["name"], d["nd"], nd0)
            except Exception as e:
                print(d.get("name"), e)


if __name__ == "__main__":
    # run the canonical module's main: under `python -m` this file is
    # executed as __main__, a second copy whose parser registries are
    # distinct from the ones register_parsers populates
    from rayopt_tpu.io.library import main as _main
    _main()
