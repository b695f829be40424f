"""P4 login-flow pattern predicates as reusable Spark columns.

The reference's login detection (crawler-engine.ts:718-1341) is a
driver loop over live DOM handles; full browser automation is a
declared non-goal (SURVEY §7.3), but its *decision logic* is pure
text/regex predicates over element attributes, and SURVEY §2 asks for
exactly those as reusable column predicates. This module extracts
them 1:1:

  * clickable-candidate scan (crawler-engine.ts:757): button / a /
    [role=button] / input[type=submit|button] / *[onclick] /
    class containing button|btn|Button|Sign.
  * login-text containment (crawler-engine.ts:868-882): the literal
    phrase list checked against every text source (textContent,
    innerText, nested child text, class, id, href, role, aria-label,
    data-testid), lowercased.
  * login word-boundary regexes (crawler-engine.ts:885-895).
  * first-visible-wins click target (crawler-engine.ts:900-933: the
    element loop clicks the first visible login element in DOM order).
  * login-form field classification (crawler-engine.ts:1108-1150):
    the username / password / submit selector lists, each kept in
    list order as a priority — the reference takes the FIRST selector
    that matches a visible element, so each element gets the minimal
    matching selector index and the page winner is the minimal
    (selector_priority, element_index).

Everything is native column expressions (codegen, no UDF), so the
predicates push into scans and survive 100 TB element tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# crawler-engine.ts:868-874 — literal containment phrases
LOGIN_TEXTS = (
    "log in", "login", "log-in",
    "sign in", "signin", "sign-in",
    "enter", "access", "member login",
    "authenticate", "auth",
)

# crawler-engine.ts:885-895 — word-boundary regexes, joined into one
# alternation (Java regex in Spark, RE2 in the DuckDB oracle — both
# support \b and \s*)
LOGIN_PATTERN = (r"\blog\s*in\b|\blogin\b|\bsign\s*in\b|\bsignin\b"
                 r"|\benter\b|\bauth\b|\baccess\b|\bmember\b")

_CLICKABLE_CLASS_MARKS = ("button", "btn", "Button", "Sign")

# crawler-engine.ts:844-845 — site-specific class fallbacks the
# reference special-cases (kept verbatim for parity)
SKOOL_CLASSES = ("SignUpButtonDesktop", "ButtonWrapper")


def _lower_all(*cols: Column) -> Column:
    """All text sources joined with spaces and lowercased —
    crawler-engine.ts:861-862 (allTextLower)."""
    return F.lower(F.concat_ws(
        " ", *[F.coalesce(c.cast("string"), F.lit("")) for c in cols]))


def is_clickable_candidate(tag: Column, typ: Column, role: Column,
                           onclick: Column, cls: Column) -> Column:
    """The reference's clickable-element query (crawler-engine.ts:757):
    `button, a, [role=button], input[type=submit|button], *[onclick],
    [class*=button|btn|Button|Sign]` as one predicate."""
    cls_s = F.coalesce(cls.cast("string"), F.lit(""))
    marks = [cls_s.contains(m) for m in _CLICKABLE_CLASS_MARKS]
    mark_any = marks[0]
    for m in marks[1:]:
        mark_any = mark_any | m
    return (F.lower(tag).isin("button", "a")
            | (F.lower(F.coalesce(role, F.lit(""))) == "button")
            | ((F.lower(tag) == "input")
               & F.lower(F.coalesce(typ, F.lit("")))
               .isin("submit", "button"))
            | (F.length(F.coalesce(onclick, F.lit(""))) > 0)
            | mark_any)


def has_login_text(*text_cols: Column) -> Column:
    """Literal phrase containment over the joined lowercase text
    (crawler-engine.ts:877-882)."""
    low = _lower_all(*text_cols)
    out = low.contains(LOGIN_TEXTS[0])
    for t in LOGIN_TEXTS[1:]:
        out = out | low.contains(t)
    return out


def matches_login_pattern(*text_cols: Column) -> Column:
    """Word-boundary regex check (crawler-engine.ts:897)."""
    return _lower_all(*text_cols).rlike(LOGIN_PATTERN)


def has_skool_class(cls: Column) -> Column:
    """Class-name fallback (crawler-engine.ts:844-845)."""
    cls_s = F.coalesce(cls.cast("string"), F.lit(""))
    return cls_s.contains(SKOOL_CLASSES[0]) | cls_s.contains(SKOOL_CLASSES[1])


def is_login_element(*text_cols: Column, cls: Column | None = None) -> Column:
    """hasLoginText || hasLoginPattern (crawler-engine.ts:899), with
    the Skool class fallback folded in when a class column is given."""
    out = has_login_text(*text_cols) | matches_login_pattern(*text_cols)
    if cls is not None:
        out = out | has_skool_class(cls)
    return out


def pick_login_click(elements: DataFrame, page_col: str = "page_url",
                     index_col: str = "element_index",
                     visible_col: str = "visible") -> DataFrame:
    """First VISIBLE login element per page in DOM order wins the
    click (crawler-engine.ts:900-933). `elements` must already carry
    an `is_login` boolean (build it with is_login_element); returns
    one row per page that has a target."""
    w = Window.partitionBy(page_col).orderBy(F.col(index_col))
    return (elements
            .filter(F.col(visible_col) & F.col("is_login"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn"))


# ---- login-form field classification (crawler-engine.ts:1108-1150) ----
# Each tuple list mirrors one selector list IN ORDER; the int emitted
# is the priority (lower = earlier selector = preferred).

def _contains(col: Column, needle: str) -> Column:
    return F.lower(F.coalesce(col.cast("string"), F.lit(""))).contains(needle)


def username_priority(tag: Column, typ: Column, name: Column,
                      eid: Column, cls: Column,
                      placeholder: Column) -> Column:
    """Priority index into usernameSelectors
    (crawler-engine.ts:1110-1125); null = not a username field."""
    is_input = F.lower(tag) == "input"
    name_l = F.lower(F.coalesce(name, F.lit("")))
    return F.when(~is_input, F.lit(None).cast("int")).otherwise(
        F.when(name_l == "username", 0)
        .when(name_l == "email", 1)
        .when(F.lower(F.coalesce(typ, F.lit(""))) == "email", 2)
        .when(F.lower(F.coalesce(eid, F.lit(""))) == "username", 3)
        .when(F.lower(F.coalesce(eid, F.lit(""))) == "email", 4)
        .when(name_l == "user", 5)
        .when(name_l == "login", 6)
        .when(_contains(placeholder, "username"), 7)
        .when(_contains(placeholder, "email"), 8)
        .when(_contains(eid, "username"), 9)
        .when(_contains(eid, "email"), 10)
        .when(_contains(cls, "username"), 11)
        .when(_contains(cls, "email"), 12)
        .otherwise(F.lit(None).cast("int")))


def password_priority(tag: Column, typ: Column, name: Column,
                      eid: Column, cls: Column,
                      placeholder: Column) -> Column:
    """Priority index into passwordSelectors
    (crawler-engine.ts:1127-1134)."""
    is_input = F.lower(tag) == "input"
    return F.when(~is_input, F.lit(None).cast("int")).otherwise(
        F.when(F.lower(F.coalesce(name, F.lit(""))) == "password", 0)
        .when(F.lower(F.coalesce(typ, F.lit(""))) == "password", 1)
        .when(F.lower(F.coalesce(eid, F.lit(""))) == "password", 2)
        .when(_contains(eid, "password"), 3)
        .when(_contains(cls, "password"), 4)
        .when(_contains(placeholder, "password"), 5)
        .otherwise(F.lit(None).cast("int")))


def submit_priority(tag: Column, typ: Column, text: Column,
                    eid: Column, cls: Column) -> Column:
    """Priority index into submitSelectors
    (crawler-engine.ts:1136-1149). Playwright's :has-text() matches
    case-insensitively, so the text phrases compare lowercased."""
    tag_l = F.lower(tag)
    typ_l = F.lower(F.coalesce(typ, F.lit("")))
    txt = F.lower(F.coalesce(text.cast("string"), F.lit("")))
    return (
        F.when((tag_l == "button") & (typ_l == "submit"), 0)
        .when((tag_l == "input") & (typ_l == "submit"), 1)
        .when((tag_l == "button") & txt.contains("login"), 2)
        .when((tag_l == "button") & txt.contains("sign in"), 3)
        .when((tag_l == "button") & txt.contains("log in"), 4)
        .when((tag_l == "button") & txt.contains("submit"), 5)
        .when((tag_l == "button") & txt.contains("enter"), 6)
        .when((tag_l == "button") & _contains(cls, "submit"), 7)
        .when((tag_l == "button") & _contains(cls, "login"), 8)
        .when((tag_l == "button") & _contains(eid, "submit"), 9)
        .when((tag_l == "button") & _contains(eid, "login"), 10)
        .otherwise(F.lit(None).cast("int")))


def pick_form_fields(elements: DataFrame, page_col: str = "page_url",
                     index_col: str = "element_index",
                     visible_col: str = "visible") -> DataFrame:
    """Per page, the chosen (username, password, submit) element —
    minimal (selector_priority, element_index) among VISIBLE
    candidates, exactly the reference's first-selector-first-visible
    iteration order (crawler-engine.ts:1154-1214). `elements` must
    carry `username_prio` / `password_prio` / `submit_prio` columns
    (build with the *_priority helpers). One hash aggregation, no
    window: min over a packed (prio, index) struct per role."""
    vis = elements.filter(F.col(visible_col))

    def best(prio: str):
        return F.min(F.when(
            F.col(prio).isNotNull(),
            F.struct(F.col(prio).alias("p"),
                     F.col(index_col).cast("long").alias("i"))))

    return (vis.groupBy(page_col)
            .agg(best("username_prio").alias("u"),
                 best("password_prio").alias("p"),
                 best("submit_prio").alias("s"))
            .select(page_col,
                    F.col("u.i").alias("username_idx"),
                    F.col("p.i").alias("password_idx"),
                    F.col("s.i").alias("submit_idx")))


# ---- login outcome verification (crawler-engine.ts:1277-1341) ----

def is_login_success_indicator(tag: Column, text: Column, cls: Column,
                               data_testid: Column,
                               aria_label: Column) -> Column:
    """successIndicators (crawler-engine.ts:1280-1289): logout /
    sign-out buttons or links (:has-text is case-insensitive),
    dashboard/profile class fragments, user-menu test ids, user-menu
    aria labels (attribute substring selectors are case-sensitive)."""
    txt = F.lower(F.coalesce(text.cast("string"), F.lit("")))
    cls_s = F.coalesce(cls.cast("string"), F.lit(""))
    return ((F.lower(tag).isin("button", "a")
             & (txt.contains("logout") | txt.contains("sign out")))
            | cls_s.contains("dashboard") | cls_s.contains("profile")
            | F.coalesce(data_testid.cast("string"), F.lit(""))
            .contains("user-menu")
            | F.coalesce(aria_label.cast("string"), F.lit(""))
            .contains("user menu"))


def is_login_error_indicator(cls: Column, text: Column) -> Column:
    """errorIndicators (crawler-engine.ts:1292-1300). The three class
    selectors (.error, .alert-error, [class*=error]) all reduce to the
    substring test — 'error' is a substring of both token forms; the
    text= matchers are Playwright case-insensitive substrings."""
    txt = F.lower(F.coalesce(text.cast("string"), F.lit("")))
    return (F.coalesce(cls.cast("string"), F.lit("")).contains("error")
            | txt.contains("invalid credentials")
            | txt.contains("login failed")
            | txt.contains("incorrect password")
            | txt.contains("user not found"))


def login_outcome(elements: DataFrame, page_col: str = "page_url",
                  index_col: str = "element_index",
                  text_col: str = "text") -> DataFrame:
    """Per-page login verdict (checkLoginSuccess,
    crawler-engine.ts:1277-1334): ANY success indicator wins (the
    reference returns on the first success hit before ever scanning
    for errors), else the FIRST error indicator in DOM order supplies
    the error detail (`errors.first().textContent()`), else
    'unclear'. `elements` must carry `is_success` / `is_error`
    booleans (build them with the two predicates above). One hash
    aggregation per page — no window, no second scan."""
    first_err = F.min(F.when(
        F.col("is_error"),
        F.struct(F.col(index_col).cast("long").alias("i"),
                 F.col(text_col).alias("t"))))
    agg = (elements.groupBy(page_col)
           .agg(F.max(F.col("is_success")).alias("ok"),
                first_err.alias("err")))
    return agg.select(
        page_col,
        F.when(F.col("ok"), "success")
        .when(F.col("err").isNotNull(), "error")
        .otherwise("unclear").alias("outcome"),
        F.when(~F.col("ok") & F.col("err").isNotNull(),
               F.col("err.t")).alias("error_detail"))
