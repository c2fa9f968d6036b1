"""Prediction Suffix Tree learning (Ron-Singer-Tishby 1996 and the
Begleiter-El-Yaniv-Yona 2004 variant).

Matches model/vmm/pst/PSTLearner.scala:106-308 semantics:

frontier <- frequent single symbols (P(sigma) >= pMin)
while frontier nonempty: pop context s
  if exists sigma with P(sigma|s) >= (1+alpha)*gammaMin and the
     likelihood ratio P(sigma|s)/P(sigma|suffix(s)) passing the test
     (original: ratio > r; variant: ratio >= r or <= 1/r):
       add s (and its path) to the tree
  if |s| < maxOrder: extend s by each symbol sigma' with
     P(sigma'·s) >= pMin into the frontier
optionally add missing children (distribution from the longest suffix
already in the tree), then gamma-smooth every node:
     P^(sigma|s) = P(sigma|s)(1 - |alphabet|*gamma) + gamma

Node labels are most-recent-first; children keyed by the next-older
symbol (PredictionSuffixTree.scala:92-160).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from flink_rtcef_spark.models.cst import CounterSuffixTree


@dataclass
class PSTNode:
    label: tuple[int, ...]
    dist: dict[int, float]
    children: dict[int, "PSTNode"] = field(default_factory=dict)

    def walk(self, context: tuple[int, ...]) -> "PSTNode":
        """Non-blocking deepest-node lookup
        (getNodeUntilLeafNonBlocking:649)."""
        node = self
        for sym in context:
            child = node.children.get(sym)
            if child is None:
                return node
            node = child
        return node

    def nodes(self) -> list["PSTNode"]:
        out = [self]
        for c in self.children.values():
            out.extend(c.nodes())
        return out

    def leaves(self) -> list["PSTNode"]:
        if not self.children:
            return [self]
        return [leaf for c in self.children.values() for leaf in c.leaves()]


class PredictionSuffixTree:
    def __init__(self, root: PSTNode, symbols: list[int], gamma_min: float):
        self.root = root
        self.symbols = symbols
        self.gamma_min = gamma_min

    def walk(self, context: tuple[int, ...]) -> PSTNode:
        return self.root.walk(context)

    def prob(self, sigma: int, context: tuple[int, ...]) -> float:
        return self.walk(context).dist.get(sigma, 0.0)

    def nodes(self) -> list[PSTNode]:
        return self.root.nodes()

    def labels(self) -> list[tuple[int, ...]]:
        return [n.label for n in self.nodes()]


def _ensure_path(
    root: PSTNode, word: tuple[int, ...], cst: CounterSuffixTree, symbols: list[int]
) -> None:
    """updateWithNewSuffix: create every prefix node on the path, each
    with the CST's conditional distribution for its label."""
    node = root
    for depth, sym in enumerate(word):
        child = node.children.get(sym)
        if child is None:
            label = word[: depth + 1]
            child = PSTNode(label=label, dist=cst.symbol_distribution(label, symbols))
            node.children[sym] = child
        node = child


def _add_missing_children(
    node: PSTNode, root: PSTNode, cst: CounterSuffixTree, symbols: list[int]
) -> None:
    """Step 4: every internal node gets all missing children; the new
    child's distribution comes from its longest suffix already in the
    tree (addMissingChild:206-226)."""
    existing = list(node.children.items())
    if existing:
        for sym in symbols:
            if sym not in node.children:
                label = (*node.label, sym)
                longest = root.walk(label)
                node.children[sym] = PSTNode(label=label, dist=dict(longest.dist))
        for _, child in existing:
            _add_missing_children(child, root, cst, symbols)


def _smooth(node: PSTNode, gamma: float, symbols: list[int]) -> None:
    """P^(sigma|s) = P(sigma|s)(1-|A|gamma) + gamma (smoothDistributions:301)."""
    k = len(symbols)
    node.dist = {s: node.dist.get(s, 0.0) * (1 - k * gamma) + gamma for s in symbols}
    for c in node.children.values():
        _smooth(c, gamma, symbols)


def learn_pst(
    cst: CounterSuffixTree,
    symbols: list[int],
    max_order: int,
    pmin: float,
    alpha: float,
    gamma_min: float,
    r: float,
    variant: bool = True,
    with_missing: bool = False,
) -> PredictionSuffixTree:
    """variant=True: Begleiter et al. (learnVariant:189-221, the one the
    factory uses); variant=False: Ron-Singer-Tishby (learnOriginal:140).
    """
    conditional_threshold = (1 + alpha) * gamma_min
    root = PSTNode(label=(), dist=cst.symbol_distribution((), symbols))

    def ratio_test(context: tuple[int, ...]) -> bool:
        suffix = context[:-1]  # drop the OLDEST symbol
        for sigma in symbols:
            p_sigma_s = cst.cond_prob(sigma, context)
            if p_sigma_s < conditional_threshold:
                continue
            p_sigma_suffix = (
                cst.prob((sigma,)) if not suffix else cst.cond_prob(sigma, suffix)
            )
            if p_sigma_suffix == 0:
                ratio = float("inf")
            else:
                ratio = p_sigma_s / p_sigma_suffix
            if variant:
                if ratio >= r or ratio <= 1 / r:
                    return True
            else:
                if ratio > r:
                    return True
        return False

    frontier = [(s,) for s in symbols if cst.prob((s,)) >= pmin]
    while frontier:
        context = frontier.pop()
        if ratio_test(context):
            _ensure_path(root, context, cst, symbols)
        if len(context) < max_order:
            for sigma in symbols:
                ext = (*context, sigma)
                if cst.prob(ext) >= pmin:
                    frontier.append(ext)
    if with_missing:
        _add_missing_children(root, root, cst, symbols)
    _smooth(root, gamma_min, symbols)
    return PredictionSuffixTree(root, symbols, gamma_min)
