"""In-place restore cassandra.yaml rewrite.

The reference finishes an in-place (PIT node) restore by editing the node's
``cassandra.yaml`` so the restored node rejoins with its original ring
position instead of bootstrapping fresh
(InPlaceRestorationStrategy.java:125-160):

- ``auto_bootstrap: true`` → ``auto_bootstrap: false`` (replace); if the
  file has no ``auto_bootstrap`` line at all, append ``auto_bootstrap:
  false`` (FileUtils.replaceOrAppend, io/FileUtils.java:69-84).
- append ``initial_token: <t1>,<t2>,…`` from the manifest's tokens
  (Manifest.getInitialTokensCassandraYamlFragment, impl/Manifest.java:
  109-112) — UNLESS the file already has an uncommented ``initial_token``
  entry, in which case warn and leave it alone (the stock yaml's commented
  ``# initial_token`` does not block the append).
- a missing cassandra.yaml is a no-op, not an error.

Pure driver-side file surgery on one small config file — no Spark here by
design; the tokens arrive from the (distributed) manifest read, and a node
has exactly one yaml.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def initial_tokens_fragment(tokens: list[str]) -> str:
    """F14: ``initial_token: t1,t2,…`` (impl/Manifest.java:109-112)."""
    return "initial_token: " + ",".join(tokens)


def update_cassandra_yaml(yaml_path: str, tokens: list[str]) -> dict[str, str]:
    """Apply the in-place-restore edits; returns what happened per knob.

    Idempotent: a second run on an already-edited file changes nothing
    (``auto_bootstrap: false`` present → neither replace nor append fires;
    the uncommented ``initial_token`` we wrote → skip with a warning,
    exactly the reference's behavior on a pre-configured file).
    """
    if not os.path.exists(yaml_path):
        logger.info("%s does not exist, not going to append to it", yaml_path)
        return {"auto_bootstrap": "missing_file", "initial_token": "missing_file"}

    with open(yaml_path, encoding="utf-8") as f:
        content = f.read()

    # replaceOrAppend(contains 'auto_bootstrap: true' -> replace,
    #                 not contains 'auto_bootstrap'   -> append)
    if "auto_bootstrap: true" in content:
        content = content.replace("auto_bootstrap: true", "auto_bootstrap: false")
        ab = "replaced"
    elif "auto_bootstrap" not in content:
        content = content + ("" if content.endswith("\n") or not content else "\n")
        content += "auto_bootstrap: false\n"
        ab = "appended"
    else:
        ab = "unchanged"

    # initial_token: an uncommented existing entry blocks the append (warn);
    # the stock yaml's '# initial_token' comment does not. Checked per-line
    # rather than by raw substring (the reference's substring test re-appends
    # forever when a commented '# initial_token' coexists with the line it
    # just wrote — we keep its observable behavior but stay idempotent).
    fragment = initial_tokens_fragment(tokens)
    has_uncommented = any(
        ln.strip().startswith("initial_token") for ln in content.splitlines()
    )
    if fragment in content:
        it = "unchanged"
    elif has_uncommented:
        logger.warning(
            "%s already contains 'initial_token'; not updating it — set it "
            "manually to: %s",
            yaml_path,
            fragment,
        )
        it = "skipped_existing"
    else:
        content = content + ("" if content.endswith("\n") or not content else "\n")
        content += fragment + "\n"
        it = "appended"

    with open(yaml_path, "w", encoding="utf-8") as f:
        f.write(content)
    return {"auto_bootstrap": ab, "initial_token": it}
