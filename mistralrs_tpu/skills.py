"""Skill store — uploaded, versioned folders the shell/exec tools can use
(the analog of `mistralrs-server-core/src/skills.rs` + the agentic loop's
shell-skill mounts, `engine/agentic_loop.rs:70-167`).

A skill is a zip archive containing a ``skill.json`` ({"name",
"description"}) and a content tree whose entry point is ``SKILL.md``.
Uploads create new versions; skills mount into an exec session's working
directory under ``skills/<name>/`` with an injected system message that
tells the model to read SKILL.md first.
"""

from __future__ import annotations

import io
import json
import re
import shutil
import tempfile
import time
import zipfile
from pathlib import Path
from typing import Any, Optional

MAX_SKILL_UPLOAD_BYTES = 50 * 1024 * 1024
MAX_SKILL_FILES = 500


def _dir_name(name: str) -> str:
    """Filesystem-safe mount directory for a skill name."""
    return re.sub(r"[^A-Za-z0-9._-]+", "-", name).strip("-") or "skill"


class SkillStore:
    """Directory-backed store: ``<root>/<skill_id>/v<N>/content/...`` +
    ``meta.json`` per skill."""

    def __init__(self, root: Optional[str] = None):
        self.root = Path(root) if root else Path(tempfile.mkdtemp(prefix="skills-"))
        self.root.mkdir(parents=True, exist_ok=True)
        self._counter = 0

    # -- upload --------------------------------------------------------------

    def upload(self, zip_bytes: bytes, name: Optional[str] = None) -> dict:
        """Store a zip upload as a new skill (or a new version of an
        existing skill with the same name). Returns the skill object."""
        if len(zip_bytes) > MAX_SKILL_UPLOAD_BYTES:
            raise ValueError("skill upload exceeds 50 MiB")
        zf = zipfile.ZipFile(io.BytesIO(zip_bytes))
        names = [i for i in zf.infolist() if not i.is_dir()]
        if len(names) > MAX_SKILL_FILES:
            raise ValueError(f"skill has more than {MAX_SKILL_FILES} files")
        # strip a single shared top-level folder (zip-of-a-directory)
        tops = {n.filename.split("/", 1)[0] for n in names}
        strip = tops.pop() + "/" if len(tops) == 1 and all(
            "/" in n.filename for n in names
        ) else ""
        files: dict[str, bytes] = {}
        for info in names:
            rel = info.filename[len(strip):] if info.filename.startswith(strip) \
                else info.filename
            p = Path(rel)
            if p.is_absolute() or ".." in p.parts:
                raise ValueError(f"unsafe path in skill zip: {info.filename}")
            files[rel] = zf.read(info)

        meta = {}
        if "skill.json" in files:
            try:
                meta = json.loads(files["skill.json"].decode())
            except (ValueError, UnicodeDecodeError) as e:
                raise ValueError(f"invalid skill.json: {e}") from e
        skill_name = name or meta.get("name")
        if not skill_name and "SKILL.md" in files:
            first = files["SKILL.md"].decode(errors="replace").strip().splitlines()
            if first:
                skill_name = first[0].lstrip("# ").strip()
        if not skill_name:
            raise ValueError("skill needs a name (skill.json, SKILL.md, or ?name=)")
        if "SKILL.md" not in files:
            raise ValueError("skill zip must contain SKILL.md")
        description = meta.get("description", "")

        existing = self._by_name(skill_name)
        if existing is None:
            self._counter += 1
            skill_id = f"skill-{int(time.time())}-{self._counter}"
            record = {
                "id": skill_id, "name": skill_name,
                "description": description,
                "created_at": int(time.time()), "versions": [],
            }
        else:
            record = existing
            skill_id = record["id"]
            if description:
                record["description"] = description
        version = len(record["versions"]) + 1
        vdir = self.root / skill_id / f"v{version}" / "content"
        vdir.mkdir(parents=True)
        for rel, data in files.items():
            dst = vdir / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.write_bytes(data)
        record["versions"].append(
            {"version": version, "created_at": int(time.time())}
        )
        (self.root / skill_id / "meta.json").write_text(json.dumps(record))
        return self._object(record)

    # -- queries -------------------------------------------------------------

    def _records(self) -> list[dict]:
        out = []
        for d in sorted(self.root.iterdir()):
            mf = d / "meta.json"
            if mf.exists():
                out.append(json.loads(mf.read_text()))
        return out

    def _by_name(self, name: str) -> Optional[dict]:
        for r in self._records():
            if r["name"] == name:
                return r
        return None

    def _record(self, skill_id: str) -> Optional[dict]:
        mf = self.root / skill_id / "meta.json"
        return json.loads(mf.read_text()) if mf.exists() else None

    @staticmethod
    def _object(r: dict) -> dict:
        return {
            "id": r["id"], "object": "skill", "created_at": r["created_at"],
            "name": r["name"], "description": r["description"],
            "latest_version": len(r["versions"]),
        }

    def list(self) -> list[dict]:
        return [self._object(r) for r in self._records()]

    def get(self, skill_id: str) -> Optional[dict]:
        r = self._record(skill_id)
        return self._object(r) if r else None

    def versions(self, skill_id: str) -> Optional[list[dict]]:
        r = self._record(skill_id)
        if r is None:
            return None
        return [
            {"id": f"{skill_id}-v{v['version']}", "object": "skill.version",
             "skill_id": skill_id, "created_at": v["created_at"],
             "version": v["version"], "name": r["name"],
             "description": r["description"]}
            for v in r["versions"]
        ]

    def delete(self, skill_id: str) -> bool:
        d = self.root / skill_id
        if not (d / "meta.json").exists():
            return False
        shutil.rmtree(d)
        return True

    def content_dir(self, skill_id: str, version: Optional[int] = None) -> Path:
        r = self._record(skill_id)
        if r is None:
            raise KeyError(skill_id)
        v = version or len(r["versions"])
        return self.root / skill_id / f"v{v}" / "content"

    # -- mounting (agentic_loop.rs:70-167) -----------------------------------

    def mount(self, skill_ids: list[str], workdir: str) -> str:
        """Copy each skill's latest content into ``<workdir>/skills/<name>/``
        and return the system message describing them (the injected
        shell-skills message)."""
        lines = [
            "Uploaded skills are folders available to the shell tool in the "
            "session working directory.",
            "Skills are not shell commands and are not installed on PATH. Do "
            "not invent commands named after a skill.",
            "Before running any command from a skill, you must read that "
            "skill's SKILL.md file. This is required.",
            "After reading SKILL.md, follow its workflow. If the skill uses "
            "bundled scripts, run them by path under the skill folder, for "
            "example `python skills/<skill-name>/scripts/<script>.py ...`.",
        ]
        for sid in skill_ids:
            r = self._record(sid)
            if r is None:
                raise KeyError(sid)
            mounted = f"skills/{_dir_name(r['name'])}"
            dst = Path(workdir) / mounted
            if dst.exists():
                shutil.rmtree(dst)
            shutil.copytree(self.content_dir(sid), dst)
            lines.append(f"- {r['name']}: {r['description']}")
            lines.append(f"  Required first command: `cat {mounted}/SKILL.md`")
            for p in sorted(dst.rglob("*")):
                if p.is_file():
                    rel = p.relative_to(Path(workdir))
                    lines.append(f"    {rel}")
        return "\n".join(lines) + "\n"


def zip_skill(files: dict[str, bytes | str]) -> bytes:
    """Helper: build a skill zip from a {path: content} mapping."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for rel, data in files.items():
            zf.writestr(rel, data if isinstance(data, bytes) else data.encode())
    return buf.getvalue()
