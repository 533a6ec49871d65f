"""Property tests for the rename-chain machinery (hypothesis):

- apply_renames is idempotent and never drops or invents values;
- a simulated multi-epoch history (records written under each epoch's
  names) always conforms to the CURRENT names, for arbitrary rename
  sequences that respect the no-reuse rule write/ddl.py enforces.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_rs_spark.sources.conform import apply_renames

_name = st.text(
    alphabet="abcdefgh", min_size=1, max_size=4
).map(lambda s: "c_" + s)


@st.composite
def rename_history(draw):
    """Random column set + a legal rename sequence (old exists, new
    unused-now AND never renamed-away — the write/ddl.py rule)."""
    cols = sorted(draw(st.sets(_name, min_size=1, max_size=5)))
    current = list(cols)
    burned: set[str] = set()  # names renamed away, never reusable
    chain: dict[str, list[str]] = {}
    epochs = [list(current)]  # column names per epoch
    n_renames = draw(st.integers(min_value=0, max_value=4))
    for i in range(n_renames):
        old = draw(st.sampled_from(current))
        new = f"r{i}_{old}"
        assert new not in current and new not in burned
        burned.add(old)
        priors = chain.pop(old, [])
        chain[new] = [old, *priors]
        current[current.index(old)] = new
        epochs.append(list(current))
    return cols, current, chain, epochs


@given(rename_history(), st.integers(min_value=0, max_value=1000))
@settings(max_examples=200, deadline=None)
def test_every_epoch_record_conforms_to_current_names(hist, seed):
    cols, current, chain, epochs = hist
    for epoch_names in epochs:
        # a record written under this epoch's names
        rec = {n: f"v{seed}_{i}" for i, n in enumerate(epoch_names)}
        want = dict(zip(current, rec.values()))  # positions are stable
        got = apply_renames(dict(rec), chain)
        assert {k: got.get(k) for k in current} == want
        # idempotent: applying again changes nothing
        assert apply_renames(dict(got), chain) == got


@given(rename_history())
@settings(max_examples=100, deadline=None)
def test_no_reuse_guard_would_fire(hist):
    """Every name the chain history holds is distinct from every
    current name — the invariant rename_column/add_columns enforce and
    apply_renames' presence test relies on."""
    _, current, chain, _ = hist
    history = {p for priors in chain.values() for p in priors}
    assert not (history & set(current))
