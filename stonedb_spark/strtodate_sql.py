"""STR_TO_DATE %-spec → SQL expression compiler (date_formats.test).

MySQL's STR_TO_DATE parses a string against a %-spec format and yields
a DATE/TIME/DATETIME whose type is derived from the format *when the
format is a constant*, and DATETIME(6) when it is not (reference
mysql-test/suite/tianmu/t/date_formats.test; MySQL 5.7
item_timefunc.cc semantics).  Neither Spark nor DuckDB can represent
the results natively — MySQL zero dates (``0000-00-00 10:20:10``) and
beyond-24h TIME values (``58:11:12`` from a day-only parse) are not
valid engine timestamps — so the compiled expression produces the
MySQL *textual rendering* as a STRING, NULL on a parse error.

Everything here is pure SQL generation: one anchored regex per format
(with a cumulative-optional tail so a value that ends mid-format still
parses, matching MySQL's "missing trailing parts default to 0"), then
``regexp_extract`` field pulls, range validation, week-number date
arithmetic, and rendering — portable across the Spark and DuckDB
dialects (the only divergences: STRING vs VARCHAR, date_add vs ``+``,
dayofweek indexing, and backslash escaping in string literals).  No
UDFs: the driver's plain-DuckDB oracle can evaluate the same text.
"""

from __future__ import annotations

import re

MONTHS = (
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
)
WEEKDAYS = (  # MySQL weekday index 1..7 = Monday..Sunday
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
)
AB_MONTHS = tuple(m[:3] for m in MONTHS)
AB_WEEKDAYS = tuple(w[:3] for w in WEEKDAYS)

# GET_FORMAT(type, name) constants (MySQL 5.7 table)
GET_FORMAT = {
    ("DATE", "USA"): "%m.%d.%Y", ("DATE", "JIS"): "%Y-%m-%d",
    ("DATE", "ISO"): "%Y-%m-%d", ("DATE", "EUR"): "%d.%m.%Y",
    ("DATE", "INTERNAL"): "%Y%m%d",
    ("DATETIME", "USA"): "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "JIS"): "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "ISO"): "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "EUR"): "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "INTERNAL"): "%Y%m%d%H%i%s",
    ("TIME", "USA"): "%h:%i:%s %p", ("TIME", "JIS"): "%H:%i:%s",
    ("TIME", "ISO"): "%H:%i:%s", ("TIME", "EUR"): "%H.%i.%s",
    ("TIME", "INTERNAL"): "%H%i%s",
}

# All regex snippets are BACKSLASH-FREE: the emitted SQL string
# literals pass through the dialect front-end's MySQL-literal
# re-encoding (where a backslash is an escape) and must mean the same
# bytes on Spark (Java regex) and DuckDB (RE2).  [0-9] replaces \d,
# [ ]* replaces \s*, and punctuation classes use explicit ranges that
# avoid [, ], ^, _, ` and backslash.
_PUNCT = "[!-/:-@{-~]"  # MySQL %. skips punctuation; corpus-covering

_D = "[0-9]"
# spec letter → (regex snippet with ONE capture group, field key)
_NUMSPEC = {
    "Y": (f"({_D}{{1,4}})", "year4"),
    "y": (f"({_D}{{1,2}})", "year2"),
    "m": (f"({_D}{{1,2}})", "month"), "c": (f"({_D}{{1,2}})", "month"),
    "d": (f"({_D}{{1,2}})", "day"), "e": (f"({_D}{{1,2}})", "day"),
    "H": (f"({_D}{{1,2}})", "hour24"), "k": (f"({_D}{{1,2}})", "hour24"),
    "h": (f"({_D}{{1,2}})", "hour12"), "I": (f"({_D}{{1,2}})", "hour12"),
    "l": (f"({_D}{{1,2}})", "hour12"),
    "i": (f"({_D}{{1,2}})", "minute"),
    "S": (f"({_D}{{1,2}})", "second"), "s": (f"({_D}{{1,2}})", "second"),
    "f": (f"({_D}{{1,6}}){_D}*", "frac"),
    "j": (f"({_D}{{1,3}})", "yearday"),
    "U": (f"({_D}{{1,2}})", "week_U"), "u": (f"({_D}{{1,2}})", "week_u"),
    "V": (f"({_D}{{1,2}})", "week_V"), "v": (f"({_D}{{1,2}})", "week_v"),
    "X": (f"({_D}{{1,4}})", "wyear_X"), "x": (f"({_D}{{1,4}})", "wyear_x"),
    "w": (f"({_D})", "wday_num"),
}
_NAMESPEC = {
    "M": ("month_name", MONTHS), "b": ("month_ab", AB_MONTHS),
    "W": ("wday_name", WEEKDAYS), "a": ("wday_ab", AB_WEEKDAYS),
}
_TIME_PART = set("HISThiklrs") | {"f"}
_DATE_PART = set("MVUXYWabcjmvuxyw")


def _tokens(fmt: str) -> list[tuple[str, str]]:
    """Format → [('spec', letter) | ('lit', text)] with %T/%r/%D
    expanded (MySQL treats them as fixed sub-sequences)."""
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            c = fmt[i + 1]
            i += 2
            if c == "T":  # %H:%i:%S with literal colons
                out += [("spec", "H"), ("lit", ":"), ("spec", "i"),
                        ("lit", ":"), ("spec", "S")]
            elif c == "r":  # %I:%i:%S %p
                out += [("spec", "I"), ("lit", ":"), ("spec", "i"),
                        ("lit", ":"), ("spec", "S"), ("lit", " "),
                        ("spec", "p")]
            elif c == "%":
                out.append(("lit", "%"))
            else:
                out.append(("spec", c))
        else:
            out.append(("lit", ch))
            i += 1
    return out


def _build_regex(toks: list[tuple[str, str]]) -> tuple[str, dict[str, int]]:
    """One anchored pattern with a cumulative-optional tail: after each
    captured unit the value may simply end (missing trailing parts
    default to 0 in MySQL) — but a mid-string mismatch fails the whole
    match (MySQL hard error → NULL)."""
    units: list[str] = []  # regex snippets; capture units split points
    groups: dict[str, int] = {}
    gi = 0
    pend = ""  # separator text accumulated before the next capture

    def _lit_rx(text: str) -> str:
        out = []
        for ch in text:
            if ch.isspace():
                out.append("[ ]*")
            elif ch.isalnum() or ch == "_":
                out.append(ch)
            elif ch in "[]^\\`":
                raise ValueError(
                    f"unsupported literal {ch!r} in STR_TO_DATE format"
                )
            else:
                out.append(f"[{ch}]")
        return "".join(out)

    for kind, val in toks:
        if kind == "lit":
            pend += val
            continue
        c = val
        if c in _NUMSPEC:
            rx, key = _NUMSPEC[c]
            gi += 1
            groups.setdefault(key, gi)
            units.append(_lit_rx(pend) + rx)
        elif c in _NAMESPEC:
            key = _NAMESPEC[c][0]
            gi += 1
            groups.setdefault(key, gi)
            units.append(_lit_rx(pend) + "([A-Za-z]+)")
        elif c == "p":
            gi += 1
            groups.setdefault("ampm", gi)
            units.append(_lit_rx(pend) + "([AaPp][Mm])")
        elif c == "D":  # ordinal day: 15th / 1st
            gi += 1
            groups.setdefault("day", gi)
            units.append(_lit_rx(pend) + f"({_D}{{1,2}})[A-Za-z]{{2}}")
        elif c == "#":
            units.append(_lit_rx(pend) + _D + "*")
        elif c == ".":
            units.append(_lit_rx(pend) + _PUNCT + "*")
        elif c == "@":
            units.append(_lit_rx(pend) + "[A-Za-z]*")
        else:
            raise ValueError(f"unsupported STR_TO_DATE spec %{c}")
        pend = ""
    if pend:
        units.append(_lit_rx(pend))
    # nest: u1 (?: u2 (?: u3 ... )? \s*$)?  — built back to front
    pat = ""
    for u in reversed(units):
        pat = f"{u}(?:{pat}|[ ]*$)" if pat else u
    return "^[ ]*" + pat, groups


def _sqlq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


class _Gen:
    """Per-engine SQL snippet helpers."""

    def __init__(self, engine: str, arg: str, pat: str,
                 groups: dict[str, int]):
        self.e = engine
        self.arg = arg
        self.groups = groups
        assert "\\" not in pat, "patterns must stay backslash-free"
        self.pat = _sqlq(pat)
        self.str_t = "STRING" if engine == "spark" else "VARCHAR"

    def g(self, key: str) -> str:
        return f"regexp_extract({self.arg}, {self.pat}, {self.groups[key]})"

    def has(self, key: str) -> bool:
        return key in self.groups

    def num(self, key: str, default: str = "0") -> str:
        g = self.g(key)
        return (f"CAST(CASE WHEN {g} = '' THEN '{default}' "
                f"ELSE {g} END AS INT)")

    def present(self, key: str) -> str:
        return f"({self.g(key)} <> '')"

    def s(self, x: str) -> str:
        return f"CAST({x} AS {self.str_t})"

    def lpad(self, x: str, n: int) -> str:
        return f"LPAD({self.s(x)}, {n}, '0')"

    def concat(self, *parts: str) -> str:
        return "CONCAT(" + ", ".join(parts) + ")"

    def date_add(self, d: str, n: str) -> str:
        if self.e == "spark":
            return f"DATE_ADD({d}, {n})"
        return f"({d} + CAST({n} AS INTEGER))"

    def dow_sunday0(self, d: str) -> str:
        """Weekday of a date, Sunday=0..Saturday=6."""
        if self.e == "spark":
            return f"(DAYOFWEEK({d}) - 1)"
        return f"DAYOFWEEK({d})"

    # --- assembled fields -------------------------------------------
    def year_expr(self) -> str:
        """%Y (with the ≤2-digit y2k rule MySQL applies to both %Y and
        %y) / %y; 0 when absent."""
        if self.has("year4"):
            g, n = self.g("year4"), self.num("year4")
            return (f"(CASE WHEN {g} = '' THEN 0 "
                    f"WHEN LENGTH({g}) <= 2 AND {n} < 70 THEN 2000 + {n} "
                    f"WHEN LENGTH({g}) <= 2 THEN 1900 + {n} "
                    f"ELSE {n} END)")
        if self.has("year2"):
            n = self.num("year2")
            return (f"(CASE WHEN {self.g('year2')} = '' THEN 0 "
                    f"WHEN {n} < 70 THEN 2000 + {n} "
                    f"ELSE 1900 + {n} END)")
        return "0"

    def name_lookup(self, key: str, names: tuple[str, ...],
                    base: int = 1) -> str:
        """Unique-prefix name match (MySQL find_type): the captured
        word must be a case-insensitive prefix of exactly one name;
        ambiguous or unknown → NULL."""
        g = f"LOWER({self.g(key)})"
        hits = " + ".join(
            f"(CASE WHEN {_sqlq(nm.lower())} LIKE {self.concat(g, chr(39) + '%' + chr(39))} "
            f"THEN 1 ELSE 0 END)"
            for nm in names
        )
        first = " ".join(
            f"WHEN {_sqlq(nm.lower())} LIKE {self.concat(g, chr(39) + '%' + chr(39))} "
            f"THEN {base + i}"
            for i, nm in enumerate(names)
        )
        return (f"(CASE WHEN ({hits}) = 1 THEN (CASE {first} END) "
                f"ELSE NULL END)")

    def month_expr(self) -> str:
        if self.has("month"):
            return self.num("month")
        if self.has("month_name"):
            return self.name_lookup("month_name", MONTHS)
        if self.has("month_ab"):
            return self.name_lookup("month_ab", AB_MONTHS)
        return "0"

    def weekday17(self) -> str | None:
        """MySQL weekday 1..7 = Monday..Sunday, NULL-able."""
        if self.has("wday_name"):
            return self.name_lookup("wday_name", WEEKDAYS)
        if self.has("wday_ab"):
            return self.name_lookup("wday_ab", AB_WEEKDAYS)
        if self.has("wday_num"):  # %w: 0=Sunday..6
            n = self.num("wday_num")
            return f"(CASE WHEN {n} = 0 THEN 7 ELSE {n} END)"
        return None

    def hour24_expr(self) -> str:
        if self.has("hour24"):
            return self.num("hour24")
        if self.has("hour12"):
            h = self.num("hour12")
            if self.has("ampm"):
                pm = f"(UPPER({self.g('ampm')}) = 'PM')"
                return (f"((({h}) % 12) + (CASE WHEN {pm} THEN 12 "
                        f"ELSE 0 END))")
            return h
        return "0"


def compile_str_to_date(arg: str, fmt: str, engine: str,
                        dynamic: bool = False) -> str:
    """SQL expression (STRING) for STR_TO_DATE(arg, '<fmt>').

    dynamic=True renders DATETIME(6) unconditionally (MySQL's behavior
    when the format is not a constant — date_formats.test's
    ``str_to_date(date, format)`` over a format column); otherwise the
    result type is derived from the format specs (item_timefunc.cc
    fix_from_format): time+date → DATETIME, time only → TIME with
    day*24 folded into hours, else DATE; 6 decimals iff %f is used.
    """
    toks = _tokens(fmt)
    specs = {v for k, v in toks if k == "spec"}
    # %r expands to %I…%p, %T to %H… — recompute from expansion
    has_p = "p" in specs
    has_h24 = bool(specs & {"H", "k"})
    has_h12 = bool(specs & {"h", "I", "l"})
    if has_p and has_h24 and not has_h12:
        return "NULL"  # %p needs a 12-hour spec (MySQL err → NULL)
    # week-spec pairing: %V needs %X, %v needs %x, %U/%u need plain %Y
    strict_sun, strict_mon = "V" in specs, "v" in specs
    loose_sun, loose_mon = "U" in specs, "u" in specs
    wy_sun, wy_mon = "X" in specs, "x" in specs
    if (strict_sun and not wy_sun) or (strict_mon and not wy_mon):
        return "NULL"
    if (wy_sun and not strict_sun) or (wy_mon and not strict_mon):
        return "NULL"
    if (loose_sun or loose_mon) and (wy_sun or wy_mon):
        return "NULL"

    pat, groups = _build_regex(toks)
    z = _Gen(engine, arg, pat, groups)

    bad: list[str] = []
    if z.has("month"):
        bad.append(f"({z.present('month')} AND {z.num('month')} > 12)")
    if z.has("day"):
        bad.append(f"({z.present('day')} AND {z.num('day')} > 31)")
    if z.has("hour24"):
        bad.append(f"({z.present('hour24')} AND {z.num('hour24')} > 23)")
    if z.has("hour12"):
        bad.append(f"({z.present('hour12')} AND {z.num('hour12')} > 12)")
    if z.has("minute"):
        bad.append(f"({z.present('minute')} AND {z.num('minute')} > 59)")
    if z.has("second"):
        bad.append(f"({z.present('second')} AND {z.num('second')} > 59)")
    if z.has("wday_num"):
        bad.append(f"({z.present('wday_num')} AND {z.num('wday_num')} > 6)")
    if z.has("ampm"):
        bad.append(f"(NOT {z.present('ampm')})")
    for key, names, _b in (
        ("month_name", MONTHS, 1), ("month_ab", AB_MONTHS, 1),
        ("wday_name", WEEKDAYS, 1), ("wday_ab", AB_WEEKDAYS, 1),
    ):
        if z.has(key):
            bad.append(f"({z.present(key)} AND "
                       f"{z.name_lookup(key, names)} IS NULL)")

    year = z.year_expr()
    month = z.month_expr()
    day = z.num("day") if z.has("day") else "0"
    hour24 = z.hour24_expr()
    minute = z.num("minute") if z.has("minute") else "0"
    second = z.num("second") if z.has("second") else "0"
    frac6 = (f"RPAD(CASE WHEN {z.g('frac')} = '' THEN '0' "
             f"ELSE {z.g('frac')} END, 6, '0')"
             if z.has("frac") else "'000000'")

    # week-number / yearday date computation (overrides y/m/d)
    wd17 = z.weekday17()
    date_expr = None
    week_key = next(
        (k for k in ("week_U", "week_u", "week_V", "week_v")
         if z.has(k)), None,
    )
    if week_key and wd17 is not None:
        sunday_first = week_key in ("week_U", "week_V")
        wyear = (z.num("wyear_X") if z.has("wyear_X")
                 else z.num("wyear_x") if z.has("wyear_x") else year)
        wk = z.num(week_key)
        jan1 = f"MAKE_DATE({wyear}, 1, 1)"
        dow0 = z.dow_sunday0(jan1)  # Sunday=0..6
        if sunday_first:
            wb = dow0
            k0 = f"(CASE WHEN {wb} = 0 THEN 0 ELSE 7 END)"
            pos = f"(({wd17}) % 7)"
        else:
            wb = f"((({dow0}) + 6) % 7)"  # Monday=0..Sunday=6
            k0 = f"(CASE WHEN {wb} <= 3 THEN 0 ELSE 7 END)"
            pos = f"(({wd17}) - 1)"
        off = f"({k0} - {wb} + (({wk}) - 1) * 7 + {pos})"
        date_expr = z.date_add(jan1, off)
    elif z.has("yearday"):
        date_expr = z.date_add(
            f"MAKE_DATE({year}, 1, 1)", f"({z.num('yearday')} - 1)"
        )
    if date_expr is not None:
        year, month, day = (
            f"YEAR({date_expr})", f"MONTH({date_expr})",
            f"DAY({date_expr})",
        )

    def dt_render(with_frac: bool) -> str:
        parts = [
            z.lpad(year, 4), "'-'", z.lpad(month, 2), "'-'",
            z.lpad(day, 2), "' '", z.lpad(hour24, 2), "':'",
            z.lpad(minute, 2), "':'", z.lpad(second, 2),
        ]
        if with_frac:
            parts += ["'.'", frac6]
        return z.concat(*parts)

    if dynamic:
        render = dt_render(True)
    else:
        time_used = bool(specs & _TIME_PART)
        date_used = bool(specs & _DATE_PART)
        decimals = "f" in specs
        if time_used and date_used:
            render = dt_render(decimals)
        elif time_used:
            hours = f"(({day}) * 24 + {hour24})"
            parts = [z.lpad(hours, 2), "':'", z.lpad(minute, 2),
                     "':'", z.lpad(second, 2)]
            if decimals:
                parts += ["'.'", frac6]
            render = z.concat(*parts)
        else:
            render = z.concat(z.lpad(year, 4), "'-'", z.lpad(month, 2),
                              "'-'", z.lpad(day, 2))

    conds = [f"({arg}) IS NULL",
             f"regexp_extract({arg}, {z.pat}, 0) = ''"] + bad
    whens = " ".join(f"WHEN {c} THEN NULL" for c in conds)
    return f"(CASE {whens} ELSE {render} END)"


def str_to_date_case(arg: str, fmt_expr: str, formats: list[str],
                     engine: str) -> str:
    """STR_TO_DATE with a NON-constant format: MySQL types the result
    DATETIME(6); we dispatch over the format literals known to the
    script (the dialect front-end collects every %-spec-looking string
    literal) — each leg compiled by compile_str_to_date(dynamic)."""
    legs = []
    for f in sorted(set(formats)):
        try:
            expr = compile_str_to_date(arg, f, engine, dynamic=True)
        except ValueError:
            continue
        legs.append(f"WHEN ({fmt_expr}) = {_sqlq(f)} THEN {expr}")
    if not legs:
        raise ValueError(
            "STR_TO_DATE with non-literal format and no candidate "
            "format literals in the script"
        )
    return "(CASE " + " ".join(legs) + " ELSE NULL END)"


def py_str_to_date(value, fmt):
    """Python reference implementation of DYNAMIC-mode STR_TO_DATE
    (format not constant → MySQL types the result DATETIME(6)).  Used
    by the Spark runner through an Arrow-batched pandas UDF — the
    pure-SQL CASE over every candidate format (str_to_date_case, still
    used for the DuckDB oracle) explodes Catalyst analysis time; the
    two independent implementations cross-validate through the oracle
    comparison."""
    import datetime

    if value is None or fmt is None:
        return None
    try:
        toks = _tokens(fmt)
    except Exception:
        return None
    specs = {v for k, v in toks if k == "spec"}
    if "p" in specs and (specs & {"H", "k"}) and not (specs & {"h", "I", "l"}):
        return None
    strict_sun, strict_mon = "V" in specs, "v" in specs
    loose = bool(specs & {"U", "u"})
    wy_sun, wy_mon = "X" in specs, "x" in specs
    if (strict_sun and not wy_sun) or (strict_mon and not wy_mon):
        return None
    if (wy_sun and not strict_sun) or (wy_mon and not strict_mon):
        return None
    if loose and (wy_sun or wy_mon):
        return None
    try:
        pat, groups = _build_regex(toks)
    except ValueError:
        return None
    m = re.match(pat, value)
    if not m:
        return None

    def g(key):
        return m.group(groups[key]) if key in groups else None

    def num(key):
        v = g(key)
        return int(v) if v else 0

    def _name(key, names):
        word = g(key)
        if not word:
            return 0
        w = word.lower()
        hits = [i + 1 for i, nm in enumerate(names)
                if nm.lower().startswith(w)]
        if len(hits) != 1:
            raise ValueError
        return hits[0]

    try:
        if g("year4"):
            y = num("year4")
            if len(g("year4")) <= 2:
                y += 2000 if y < 70 else 1900
        elif g("year2"):
            y = num("year2")
            y += 2000 if y < 70 else 1900
        else:
            y = 0
        if g("month"):
            mo = num("month")
            if mo > 12:
                return None
        elif "month_name" in groups:
            mo = _name("month_name", MONTHS)
        elif "month_ab" in groups:
            mo = _name("month_ab", AB_MONTHS)
        else:
            mo = 0
        d = num("day")
        if d > 31:
            return None
        if g("hour24") is not None and num("hour24") > 23:
            return None
        if g("hour12"):
            if num("hour12") > 12:
                return None
            h = num("hour12") % 12
            if g("ampm") and g("ampm").upper() == "PM":
                h += 12
        else:
            h = num("hour24")
        if "ampm" in groups and not g("ampm"):
            return None  # value exhausted before %p: MySQL err
        mi, sec = num("minute"), num("second")
        if mi > 59 or sec > 59:
            return None
        frac = (g("frac") or "0").ljust(6, "0")
        # weekday 1..7 = Monday..Sunday
        if "wday_name" in groups:
            wd = _name("wday_name", WEEKDAYS)
        elif "wday_ab" in groups:
            wd = _name("wday_ab", AB_WEEKDAYS)
        elif g("wday_num"):
            n = num("wday_num")
            if n > 6:
                return None
            wd = 7 if n == 0 else n
        else:
            wd = 0
        week_key = next((k for k in ("week_U", "week_u", "week_V",
                                     "week_v") if g(k)), None)
        if week_key and wd:
            sunday_first = week_key in ("week_U", "week_V")
            wy = (num("wyear_X") if g("wyear_X")
                  else num("wyear_x") if g("wyear_x") else y)
            wk = num(week_key)
            jan1 = datetime.date(wy, 1, 1)
            dow0 = (jan1.weekday() + 1) % 7  # Sunday=0..6
            if sunday_first:
                wb = dow0
                k0 = 0 if wb == 0 else 7
                pos = wd % 7
            else:
                wb = (dow0 + 6) % 7  # Monday=0..6
                k0 = 0 if wb <= 3 else 7
                pos = wd - 1
            dt = jan1 + datetime.timedelta(
                days=k0 - wb + (wk - 1) * 7 + pos)
            y, mo, d = dt.year, dt.month, dt.day
        elif g("yearday"):
            dt = (datetime.date(y, 1, 1)
                  + datetime.timedelta(days=num("yearday") - 1))
            y, mo, d = dt.year, dt.month, dt.day
    except ValueError:
        return None
    return (f"{y:04d}-{mo:02d}-{d:02d} "
            f"{h:02d}:{mi:02d}:{sec:02d}.{frac}")
