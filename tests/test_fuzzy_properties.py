"""Property test for the fuzzy-match count filter's soundness: the
positional q-gram bag intersection of two strings within Levenshtein
distance d is NEVER below min_len - q + 1 - q*d (Gravano et al.'s
pigeonhole bound) — i.e. text.fuzzy_match_pairs' COUNT FILTER can
never prune a true match that blocking surfaced. The round-5 advice
showed the DISTINCT-gram variant violates this on repeated-character
keys; this guards the fixed invariant for arbitrary edit scripts."""

from collections import Counter

from hypothesis import given, settings, strategies as st

Q = 3
MAX_D = 3


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def gram_bag(s: str) -> Counter:
    if len(s) < Q:
        return Counter([s])
    return Counter(s[i : i + Q] for i in range(len(s) - Q + 1))


def bag_intersection(a: str, b: str) -> int:
    ca, cb = gram_bag(a), gram_bag(b)
    return sum(min(ca[g], cb[g]) for g in ca)


@st.composite
def base_and_edits(draw):
    base = draw(st.text(alphabet="abc", min_size=Q + Q * MAX_D, max_size=30))
    n_edits = draw(st.integers(min_value=0, max_value=MAX_D))
    s = base
    for _ in range(n_edits):
        op = draw(st.sampled_from(["ins", "del", "sub"]))
        pos = draw(st.integers(min_value=0, max_value=max(len(s) - 1, 0)))
        ch = draw(st.sampled_from("abc"))
        if op == "ins":
            s = s[:pos] + ch + s[pos:]
        elif op == "del" and s:
            s = s[:pos] + s[pos + 1 :]
        else:
            s = s[:pos] + ch + s[pos + 1 :] if s else ch
    return base, s


@settings(max_examples=300, deadline=None)
@given(base_and_edits())
def test_positional_bag_bound_is_sound(pair):
    a, b = pair
    d = lev(a, b)
    if d > MAX_D:
        return  # edits can cancel or compound; only the <= d band matters
    bound = min(len(a), len(b)) - Q + 1 - Q * d
    assert bag_intersection(a, b) >= max(bound, 0), (a, b, d)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab", min_size=Q, max_size=25))
def test_identical_strings_meet_the_zero_edit_bound(s):
    # d = 0: the bag intersection is exactly the gram count, which must
    # meet len - q + 1 (the repeated-character case the distinct-gram
    # filter failed)
    assert bag_intersection(s, s) == len(s) - Q + 1
