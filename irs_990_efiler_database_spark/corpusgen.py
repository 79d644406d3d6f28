"""Deterministic synthetic-990 document kernel, shared by every corpus
path (driver-side lists, executor-side mapInPandas, and the golden
oracle builders).

Real e-file 990s run 50-250+ KB (the reference's corpus is ~3M such
docs, BUILD_SCRIPTS/README.md:256) while the handcrafted fixtures
average 2.3 KB; ``inflate_doc`` reproduces the realistic shape the way
real filings get big — repeating groups at observed cardinalities
(5-40 Form990PartVIISectionAGrp persons, half as many Schedule J comp
rows, all flowing into the MANY tables) plus ~1 KB Schedule O
narrative blocks to a deterministic 50-250 KB byte target.

This module lives in the PACKAGE (not tools/) so executor-side
closures can import it: the tools/ scripts are not an importable
package on the workers, which is why the kernel used to be inlined in
``tools/gen_xml_corpus.gen_bundle`` — that inlining made the realistic
corpus executor-only, so the driver-side golden oracle builders could
never see realistic-shape docs (VERDICT r12 next-round #1)."""

from __future__ import annotations

import re

_REALISTIC_WORDS = (
    "community outreach program grant support services education "
    "health mission volunteer board governance compliance fiscal "
    "stewardship initiative partnership development impact annual "
    "report disclosure policy review committee expenditure"
).upper().split()


def inflate_doc(xml: str, i: int) -> str:
    """Inflate one fixture-size doc to the realistic 50-250 KB band.
    Deterministic in ``i`` alone — both the byte target (Knuth-hash
    uniform) and the Part VII cardinality (5-40)."""
    words = _REALISTIC_WORDS
    target = (50 + (i * 2654435761 & 0x7FFFFFFF) % 201) * 1024
    npart = 5 + (i * 97) % 36  # Part VII cardinality 5-40
    if "</IRS990>" in xml:
        rows = "".join(
            f"<Form990PartVIISectionAGrp>"
            f"<PersonNm>PERSON {i % 100000:05d}-{j:02d}</PersonNm>"
            f"<TitleTxt>DIRECTOR</TitleTxt>"
            f"<AverageHoursPerWeekRt>{1 + j % 40}.0"
            f"</AverageHoursPerWeekRt><OfficerInd>X</OfficerInd>"
            f"<ReportableCompFromOrgAmt>{1000 * (j + 1)}"
            f"</ReportableCompFromOrgAmt>"
            f"<OtherCompensationAmt>{10 * j}</OtherCompensationAmt>"
            f"</Form990PartVIISectionAGrp>"
            for j in range(npart)
        )
        # a filing with an inflated Part VII realistically flags its
        # Schedule O continuation (feeds the
        # F9-P07-TABLE-03-SCHED-O-REPORT MANY slice)
        rows += "<InfoInScheduleOPartVIIInd>X</InfoInScheduleOPartVIIInd>"
        xml = xml.replace("</IRS990>", rows + "</IRS990>", 1)
    if "</IRS990ScheduleJ>" in xml:
        rows = "".join(
            f"<RltdOrgOfficerTrstKeyEmplGrp>"
            f"<PersonNm>PERSON {i % 100000:05d}-{j:02d}</PersonNm>"
            f"<TitleTxt>DIRECTOR</TitleTxt>"
            f"<BaseCompensationFilingOrgAmt>{1000 * (j + 1)}"
            f"</BaseCompensationFilingOrgAmt>"
            f"<BonusFilingOrganizationAmount>{100 * j}"
            f"</BonusFilingOrganizationAmount>"
            f"</RltdOrgOfficerTrstKeyEmplGrp>"
            for j in range(npart // 2)
        )
        xml = xml.replace(
            "</IRS990ScheduleJ>", rows + "</IRS990ScheduleJ>", 1
        )
    deficit = target - len(xml)
    if deficit > 0:
        blocks = []
        j = 0
        while deficit > 0:
            txt = " ".join(
                words[(i + j + t) % len(words)] for t in range(150)
            )
            b = (
                f"<SupplementalInformationDetail>"
                f"<FormAndLineReferenceDesc>PART {j}"
                f"</FormAndLineReferenceDesc>"
                f"<ExplanationTxt>{txt}</ExplanationTxt>"
                f"</SupplementalInformationDetail>"
            )
            blocks.append(b)
            deficit -= len(b)
            j += 1
        pad = "".join(blocks)
        if "</IRS990ScheduleO>" in xml:
            # extend the existing schedule, never duplicate it
            xml = xml.replace(
                "</IRS990ScheduleO>", pad + "</IRS990ScheduleO>", 1
            )
        else:
            xml = xml.replace(
                "</ReturnData>",
                f"<IRS990ScheduleO>{pad}</IRS990ScheduleO></ReturnData>",
                1,
            )
    return xml


def synth_doc(
    i: int,
    texts: list[str],
    corrupt_every: int | None = None,
    realistic: bool = False,
) -> tuple[str, str]:
    """One synthetic filing: fixture ``i % len(texts)`` (round-robin
    preserves the vintage/form mix at every corpus size) with a fresh
    unique EIN and ObjectId. ``corrupt_every``: every k-th doc is
    truncated mid-element (an unclosed tag the PERMISSIVE parser must
    dead-letter). Byte-identical to both pre-refactor paths
    (tools/gen_xml_corpus._make_doc and the gen_bundle executor
    closure) — parity-pinned in tests."""
    xml = texts[i % len(texts)]
    xml = re.sub(
        r"<EIN>1000000\d\d</EIN>",
        f"<EIN>{500000000 + i}</EIN>",
        xml,
        count=1,
    )
    if realistic:
        xml = inflate_doc(xml, i)
    if corrupt_every and i % corrupt_every == corrupt_every - 1:
        xml = xml[: max(1, int(len(xml) * 0.6))]
    return (f"file:///synthetic/2014{700000000 + i}_public.xml", xml)
