"""Synthetic tiny dataset in the reference TSV formats (README.md:16-58).

Generated (not copied) so tests are self-contained; the real CAsT sample under
/root/reference/dataset/cast exercises the same parsers when present.
"""

import os
import random


WORDS = ("energy motion kinetic potential mechanical object system force heat "
         "whale dolphin orca size ocean mammal salary nurse doctor physician "
         "median pay oregon storage battery spring compressed power grid "
         "turbine solar panel wind water dam generator").split()


def make_dataset(root: str, name: str = "toy", n_queries: int = 12,
                 n_passages: int = 30, seed: int = 7) -> str:
    rng = random.Random(seed)
    base = os.path.join(root, name)
    os.makedirs(base, exist_ok=True)

    def sent(lo=4, hi=12):
        return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))

    pids = [f"P_{i}" for i in range(n_passages)]
    passages = {p: (sent(8, 20) + ". " + sent(8, 20) + ".") for p in pids}

    topics = {}
    qids = []
    for t in range(1, 4):
        for turn in range(1, n_queries // 3 + 1):
            qid = f"{t}_{turn}"
            qids.append(qid)
            topics[qid] = sent(3, 8) + "?"

    with open(f"{base}/{name}.query", "w") as f:
        f.write("#query_id\t#query\n")
        for q in qids:
            f.write(f"{q}\t{topics[q]}\n")
    with open(f"{base}/{name}.reformulation.query", "w") as f:
        f.write("#query_id\t#query\n")
        for q in qids:
            f.write(f"{q}\t{topics[q]}\n")
    with open(f"{base}/{name}.passage", "w") as f:
        f.write("#passage_id\t#passage\n")
        for p, text in passages.items():
            f.write(f"{p}\t{text}\n")

    gold = {q: rng.sample(pids, rng.randint(1, 2)) for q in qids}
    with open(f"{base}/{name}.pool", "w") as f:
        f.write("#query_id #Q0 #passage_id #rank #score #model\n")
        for q in qids:
            cands = rng.sample(pids, 15)
            for r, p in enumerate(cands):
                f.write(f"{q} Q0 {p} {r+1} {1.0/(r+1):.4f} synth\n")
    with open(f"{base}/{name}.qrel", "w") as f:
        f.write("#query_id #0 #passage_id #relevance\n")
        for q in qids:
            f.write(f"{q} 0 {gold[q][0]} 1\n")
    with open(f"{base}/{name}.answer", "w") as f:
        f.write("#context_id\t#query_id\t#passage_id\t#answer\n")
        for q in qids:
            topic, turn = q.split("_")
            ctx = ";".join(f"{topic}_{i}" for i in range(1, int(turn)))
            answer = " ".join(passages[gold[q][0]].split()[:rng.randint(6, 15)])
            f.write(f"{ctx}\t{q}\t{';'.join(gold[q])}\t{answer}\n")
    with open(f"{base}/{name}.split", "w") as f:
        f.write("#query_id\t#split\n")
        for i, q in enumerate(qids):
            split = "train" if i % 3 != 2 else ("dev" if i % 6 == 2 else "test")
            f.write(f"{q}\t{split}\n")
    return base
