"""Extract Poseidon round-constant/MDS tables from the reference Rust source.

The tables in poseidon/src/pasta/{fp,fq}_{kimchi,legacy}.rs are generated
data (sage `params.sage`), not code; we lift the decimal constants into JSON
so the TPU framework carries its own copy. Run once:

    python scripts/extract_poseidon_params.py

Writes proof_systems_tpu/poseidon/data/{fp_kimchi,fq_kimchi,fp_legacy,fq_legacy}.json
with {"mds": [[dec_str;3];3], "round_constants": [[dec_str;3];rounds]}.
"""

import json
import pathlib
import re

REF = pathlib.Path("/root/reference/poseidon/src/pasta")
OUT = pathlib.Path(__file__).resolve().parent.parent / "proof_systems_tpu/poseidon/data"

NUM = re.compile(r'"(\d+)"')


def extract(name: str) -> None:
    text = (REF / f"{name}.rs").read_text()
    # The file builds `Params { mds: [...], round_constants: [...] }`;
    # constants appear in order: 9 MDS entries first, then rounds*3 RCs.
    mds_start = text.index("mds:")
    rc_start = text.index("round_constants:")
    assert mds_start < rc_start
    mds_nums = NUM.findall(text[mds_start:rc_start])
    rc_nums = NUM.findall(text[rc_start:])
    assert len(mds_nums) == 9, (name, len(mds_nums))
    assert len(rc_nums) % 3 == 0 and len(rc_nums) >= 3 * 55, (name, len(rc_nums))
    data = {
        "mds": [mds_nums[i * 3 : (i + 1) * 3] for i in range(3)],
        "round_constants": [
            rc_nums[i * 3 : (i + 1) * 3] for i in range(len(rc_nums) // 3)
        ],
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / f"{name}.json").write_text(json.dumps(data))
    print(f"{name}: {len(data['round_constants'])} rounds")


ARRABBIATA_REF = pathlib.Path("/root/reference/arrabbiata/src")


def extract_arrabbiata(field: str) -> None:
    """Arrabbiata's custom width-3 60-full-round x^5 instance
    (arrabbiata/src/poseidon_3_60_0_5_5_{fp,fq}.rs, sage-generated)."""
    text = (ARRABBIATA_REF / f"poseidon_3_60_0_5_5_{field}.rs").read_text()
    mds_start = text.index("mds:")
    rc_start = text.index("round_constants:")
    mds_nums = NUM.findall(text[mds_start:rc_start])
    rc_nums = NUM.findall(text[rc_start:])
    assert len(mds_nums) == 9, (field, len(mds_nums))
    assert len(rc_nums) == 3 * 60, (field, len(rc_nums))
    data = {
        "mds": [mds_nums[i * 3 : (i + 1) * 3] for i in range(3)],
        "round_constants": [rc_nums[i * 3 : (i + 1) * 3] for i in range(60)],
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / f"{field}_3_60_0_5_5.json").write_text(json.dumps(data))
    print(f"{field}_3_60_0_5_5: {len(data['round_constants'])} rounds")


if __name__ == "__main__":
    for name in ["fp_kimchi", "fq_kimchi", "fp_legacy", "fq_legacy"]:
        extract(name)
    for field in ["fp", "fq"]:
        extract_arrabbiata(field)
