"""P4 login-pattern predicates vs the reference's decision table
(crawler-engine.ts:718-1341). Each case is a literal scenario from
the reference loop, reproduced through the column predicates."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.login import (is_clickable_candidate,
                                           is_login_element,
                                           password_priority,
                                           pick_form_fields,
                                           pick_login_click,
                                           submit_priority,
                                           username_priority)

COLS = ("page_url", "element_index", "tag", "typ", "role", "onclick",
        "text", "child_text", "cls", "eid", "href", "visible")


def _elements(spark, rows):
    return spark.createDataFrame([dict(zip(COLS, r)) for r in rows])


def _detect(spark, rows):
    e = _elements(spark, rows)
    srcs = [F.col(c) for c in
            ("text", "child_text", "cls", "eid", "href", "role")]
    cand = (e.filter(is_clickable_candidate(
        F.col("tag"), F.col("typ"), F.col("role"),
        F.col("onclick"), F.col("cls")))
        .withColumn("is_login",
                    is_login_element(*srcs, cls=F.col("cls"))))
    return {r["page_url"]: r["element_index"]
            for r in pick_login_click(cand).collect()}


def test_login_detection_reference_cases(spark):
    rows = [
        # nested child text only (<button><span>Log In</span></button>,
        # crawler-engine.ts:783-792): textContent empty, childText hits
        ("p1", 1, "button", "", "", "", "", "LOG IN", "x", "e1", "/a", True),
        # earlier element on p1 is clickable but not login → skipped
        ("p1", 0, "a", "", "", "", "products", "", "x", "e0", "/b", True),
        # Skool class fallback with NO login text anywhere
        # (crawler-engine.ts:844-845)
        ("p2", 4, "div", "", "", "", "join", "", "SignUpButtonDesktop",
         "e4", "/c", True),
        # href carries the only marker (a[href*=login],
        # crawler-engine.ts:1025)
        ("p3", 2, "a", "", "", "", "account", "", "x", "e2",
         "/login?next=1", True),
        # invisible login element must NOT win; later visible one does
        # (crawler-engine.ts:933: only isVisible elements are clicked)
        ("p4", 0, "button", "", "", "", "Log In", "", "x", "e5", "/d",
         False),
        ("p4", 7, "button", "", "", "", "Sign in", "", "x", "e6", "/e",
         True),
        # non-clickable tag with no marks is filtered before matching
        ("p5", 0, "p", "", "", "", "login help", "", "plain", "e7", "/f",
         True),
    ]
    got = _detect(spark, rows)
    assert got == {"p1": 1, "p2": 4, "p3": 2, "p4": 7}


def test_login_containment_quirk(spark):
    """The reference's loginTexts check is plain substring containment
    (crawler-engine.ts:877-882), so 'entertainment' DOES match via
    'enter' — a quirk, reproduced faithfully (the word-boundary regex
    list exists in the reference *in addition to*, not instead of,
    containment)."""
    rows = [("q1", 3, "a", "", "", "", "entertainment news", "", "x",
             "e1", "/n", True)]
    assert _detect(spark, rows) == {"q1": 3}


def test_form_field_priority_beats_dom_order(spark):
    """Selector-list order outranks DOM order: input[name=email]
    (selector 2 of usernameSelectors) at index 9 beats
    input[type=email] (selector 3) at index 1
    (crawler-engine.ts:1154-1175 iterates selectors outermost)."""
    rows = [
        ("f1", 1, "input", "email", "", "", "", "", "x", "e1", "", True),
        ("f1", 9, "input", "text", "", "", "", "", "x", "e2", "", True),
        ("f1", 5, "input", "password", "", "", "", "", "x", "e3", "",
         True),
        # invisible submit button ignored; class-submit button wins
        ("f1", 2, "button", "submit", "", "", "OK", "", "x", "e4", "",
         False),
        ("f1", 8, "button", "", "", "", "go", "", "submit-btn", "e5", "",
         True),
    ]
    e = _elements(spark, rows)
    e = (e.withColumn("name",
                      F.when(F.col("element_index") == 9, "email")
                      .otherwise(""))
         .withColumn("placeholder", F.lit("")))
    e = (e.withColumn("username_prio", username_priority(
            F.col("tag"), F.col("typ"), F.col("name"), F.col("eid"),
            F.col("cls"), F.col("placeholder")))
         .withColumn("password_prio", password_priority(
            F.col("tag"), F.col("typ"), F.col("name"), F.col("eid"),
            F.col("cls"), F.col("placeholder")))
         .withColumn("submit_prio", submit_priority(
            F.col("tag"), F.col("typ"), F.col("text"), F.col("eid"),
            F.col("cls"))))
    [r] = pick_form_fields(e).collect()
    assert (r["username_idx"], r["password_idx"], r["submit_idx"]) == \
        (9, 5, 8)


def test_login_outcome_reference_semantics(spark):
    """checkLoginSuccess (crawler-engine.ts:1277-1334): success
    indicators are scanned FIRST and short-circuit (a page with both a
    dashboard element and an error banner reports success); otherwise
    the first error element in DOM order supplies the detail text."""
    from crawler_spark.functions.login import (is_login_error_indicator,
                                               is_login_success_indicator,
                                               login_outcome)
    rows = [
        # page s: error banner at index 0 AND dashboard at 5 → success
        ("s", 0, "div", "Login failed", "alert-error", "", ""),
        ("s", 5, "div", "home", "dashboard-wrap", "", ""),
        # page e: two error elements → first one's text is the detail
        ("e", 3, "div", "Incorrect password", "c", "", ""),
        ("e", 1, "p", "boom", "error", "", ""),
        # page u: nothing matches → unclear
        ("u", 0, "div", "hello", "c", "", ""),
        # page a: aria-label user menu (case-sensitive attr substring)
        ("a", 2, "div", "x", "c", "", "main user menu"),
        # page n: 'Sign out' text on a DIV is NOT a success indicator
        # (the reference only queries button/a for logout text)
        ("n", 0, "div", "Sign out", "c", "", ""),
    ]
    e = spark.createDataFrame(
        [dict(zip(("page_url", "element_index", "tag", "text", "cls",
                   "data_testid", "aria_label"), r)) for r in rows])
    e = (e.withColumn("is_success", is_login_success_indicator(
            F.col("tag"), F.col("text"), F.col("cls"),
            F.col("data_testid"), F.col("aria_label")))
         .withColumn("is_error", is_login_error_indicator(
            F.col("cls"), F.col("text"))))
    got = {r["page_url"]: (r["outcome"], r["error_detail"])
           for r in login_outcome(e).collect()}
    assert got == {"s": ("success", None),
                   "e": ("error", "boom"),
                   "u": ("unclear", None),
                   "a": ("success", None),
                   "n": ("unclear", None)}
