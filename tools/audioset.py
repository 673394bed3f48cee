#!/usr/bin/env python
"""Filter AudioSet segment lists for usable background noise.

Parity: reference tools/audioset.py — keep segments labelled subway
(/m/0195fx) that carry NO music-related labels (the /m/04rlf music
subtree plus /m/015lz1 singing subtree, expanded recursively through the
ontology's child_ids).
"""

import argparse
import csv
import json

SUBWAY = "/m/0195fx"
SINGING = "/m/015lz1"
MUSIC = "/m/04rlf"


def expand(ontology: dict, root: str, into: set) -> None:
    if root in into:
        return
    into.add(root)
    for child in ontology[root]["child_ids"]:
        expand(ontology, child, into)


def main():
    args = argparse.ArgumentParser()
    args.add_argument("csv")
    args.add_argument("out")
    args.add_argument("--ontology")
    args = args.parse_args()

    music_related: set = set()
    if args.ontology:
        with open(args.ontology, "r", encoding="utf8") as fin:
            ontology = {o["id"]: o for o in json.load(fin)}
        expand(ontology, SINGING, music_related)
        expand(ontology, MUSIC, music_related)

    segments = []
    with open(args.csv, "r", encoding="utf8") as fin:
        for item in csv.reader(fin, skipinitialspace=True):
            if item[0].startswith("#"):
                continue
            labels = set(item[3].split(","))
            if SUBWAY in labels and not (music_related & labels):
                segments.append(item)

    with open(args.out, "w", encoding="utf8", newline="\n") as fout:
        writer = csv.writer(fout, lineterminator="\r\n")
        writer.writerow(["# YTID", "start_seconds", "end_seconds", "positive_labels"])
        writer.writerows(segments)
    print(len(segments))


if __name__ == "__main__":
    main()
